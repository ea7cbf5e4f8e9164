package graft.sources

import graft.model.{SchemaRegistry, XsdSchema}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/**
 * GAR XML ingest (SURVEY.md SRC-1..4): the Spark re-expression of the
 * reference's streaming scan (/root/reference/ru_address/source/xml.py:19-38).
 *
 * Scale shape:
 *  - files are read through the Hadoop FileSystem API (HDFS/S3/local all
 *    work — executors must not assume a shared POSIX filesystem);
 *  - large files are SPLIT into byte-range chunks, each scanned by its own
 *    task from the first element boundary past the chunk start (offset-split
 *    with element-boundary resync), so ingest parallelism >= cores instead of
 *    <= files. A task owns the elements that *start* inside its range —
 *    standard Hadoop split semantics;
 *  - every row carries `ord` = the element's byte offset in its file, so
 *    document order (ORD-1) is reconstructible after any shuffle with a plain
 *    `orderBy(ord)`;
 *  - per-task memory is constant: the scanner holds one element's bytes at a
 *    time, mirroring the reference's iterparse + buffer reclamation
 *    (xml.py:69-71).
 *
 * Schema + entity tag come from the *runtime-parsed XSD* (XsdSchema, SRC-2),
 * exactly like the reference's Definition — a GAR schema update changes the
 * engine's behavior without a code change. The registry remains a fallback
 * for XSD-less use.
 */
object GarXml {

  /** Parse a single XML stream into typed Rows per the table schema (StAX
    * whole-file path — the test oracle for the split scanner, and the shape
    * check for fixtures). */
  def parseStream(in: java.io.InputStream, schema: StructType, entityTag: String): Iterator[Row] = {
    val factory = XMLInputFactory.newInstance()
    factory.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    factory.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val reader = factory.createXMLStreamReader(in, "UTF-8")
    new Iterator[Row] {
      private var nextRow: Row = _
      private var finished = false

      private def advance(): Unit = {
        nextRow = null
        while (nextRow == null && !finished) {
          if (!reader.hasNext) { finished = true; reader.close(); in.close() }
          else if (reader.next() == XMLStreamConstants.START_ELEMENT &&
              reader.getLocalName == entityTag) {
            val attrs = (0 until reader.getAttributeCount)
              .map(i => reader.getAttributeLocalName(i) -> reader.getAttributeValue(i))
              .toMap
            nextRow = Row.fromSeq(schema.fields.map(f =>
              attrs.get(f.name).map(v => cast(v, f.dataType)).orNull).toSeq)
          }
        }
      }

      def hasNext: Boolean = {
        if (nextRow == null && !finished) advance()
        nextRow != null
      }
      def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = nextRow; nextRow = null; r
      }
    }
  }

  /** XSD->engine typed value (the reference passes strings through; we land
    * them in the XSD-derived Spark types). */
  private def cast(v: String, t: DataType): Any = t match {
    case StringType => v
    case LongType => v.toLong
    case IntegerType => v.toInt
    case ShortType => v.toShort
    case ByteType => v.toByte
    case BooleanType => v == "true" || v == "1"
    case DateType => java.sql.Date.valueOf(v)
    case other => sys.error(s"unexpected GAR type $other")
  }

  // ------------------------------------------------------- split scanning

  /** One scanned element: byte offset of its '<' plus its attribute map. */
  private[sources] case class RawElem(offset: Long, attrs: Map[String, String])

  /**
   * Byte-range element scanner: yields every `<tag ...>` element whose start
   * offset is in [start, end) — reading past `end` to finish the last owned
   * element. ASCII byte matching is safe inside UTF-8 (multi-byte sequences
   * never contain ASCII bytes). Attribute values handle the five named XML
   * entities, numeric character references, and XML attribute-value
   * whitespace normalization (literal tab/newline/CR -> space), matching what
   * a conforming parser (lxml in the reference, StAX here) produces.
   *
   * Comments / CDATA / DOCTYPE: any such construct that STARTS inside the
   * scanned range is skipped wholesale, so `<tag` text within it cannot emit
   * phantom rows (whole-file scans are therefore fully comment/CDATA-safe).
   * Residual precondition, split scans only: a construct spanning a chunk
   * boundary is invisible to the task that starts inside it — byte-range
   * splitting of XML fundamentally requires that (GAR deliveries are
   * machine-generated attribute-only rows; they contain neither).
   */
  private[sources] def scanElements(in: java.io.InputStream, start: Long, end: Long,
      tag: String): Iterator[RawElem] = {
    val pat = ("<" + tag).getBytes("US-ASCII")
    val bin = new java.io.BufferedInputStream(in, 1 << 16)
    new Iterator[RawElem] {
      private var pos = start          // absolute offset of the NEXT byte to read
      private var nextElem: RawElem = _
      private var done = false

      private def readByte(): Int = { val b = bin.read(); if (b >= 0) pos += 1; b }

      /** Skip until the 3-byte terminator abc appears (sliding window, so
        * overlapping prefixes like "]]]>" terminate correctly). */
      private def skipUntil3(a: Int, b: Int, c: Int): Boolean = {
        var x = -1; var y = -1
        while (true) {
          val z = readByte()
          if (z < 0) { done = true; bin.close(); return false }
          if (x == a && y == b && z == c) return true
          x = y; y = z
        }
        false
      }

      private def advance(): Unit = {
        nextElem = null
        var matched = 0
        while (nextElem == null && !done) {
          if (pos - pat.length >= end && matched == 0) { done = true; bin.close(); return }
          val b = readByte()
          if (b < 0) { done = true; bin.close(); return }
          if (b == pat(matched)) {
            matched += 1
            if (matched == pat.length) {
              // delimiter required: "<OBJECT" must not match "<OBJECTLEVEL"
              val d = readByte()
              matched = 0
              if (d == ' ' || d == '\t' || d == '\n' || d == '\r' || d == '/' || d == '>') {
                val elemStart = pos - pat.length - 1
                if (elemStart >= end) { done = true; bin.close(); return }
                nextElem = RawElem(elemStart, parseAttrs(d))
              }
            }
          } else if (matched == 1 && b == '!') {
            // "<!" opens a comment, CDATA section or DOCTYPE — skip it whole
            // so "<tag" text inside can't emit phantom rows
            matched = 0
            readByte() match {
              case '-' => // <!-- ... -->   (second '-' consumed by the window)
                if (!skipUntil3('-', '-', '>')) return
              case '[' => // <![CDATA[ ... ]]>
                if (!skipUntil3(']', ']', '>')) return
              case '>' => // degenerate "<!>"
              case _ => // <!DOCTYPE ...> (no internal subset in GAR files)
                var z = 0
                while ({ z = readByte(); z >= 0 && z != '>' }) ()
                if (z < 0) { done = true; bin.close(); return }
            }
          } else matched = if (b == pat(0)) 1 else 0
        }
      }

      /** Parse attributes from just after the tag name to the closing '>'. */
      private def parseAttrs(first: Int): Map[String, String] = {
        val attrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
        var b = first
        while (b >= 0 && b != '>') {
          if (b == '/') { b = readByte() } // self-close
          else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') b = readByte()
          else {
            val name = new java.lang.StringBuilder
            // ANY XML whitespace terminates the name — a tab/newline before
            // '=' (legal XML) must not be swallowed into the attribute name
            while (b >= 0 && b != '=' && b != ' ' && b != '\t' && b != '\n' &&
                b != '\r' && b != '>' && b != '/') {
              name.append(b.toChar); b = readByte()
            }
            while (b == ' ' || b == '\t' || b == '\n' || b == '\r') b = readByte()
            if (b == '=') {
              b = readByte()
              while (b == ' ' || b == '\t' || b == '\n' || b == '\r') b = readByte()
              val quote = b
              val raw = new java.io.ByteArrayOutputStream(64)
              b = bin.read(); if (b >= 0) pos += 1
              while (b >= 0 && b != quote) { raw.write(b); b = bin.read(); if (b >= 0) pos += 1 }
              attrs(name.toString) = decodeAttr(raw.toString("UTF-8"))
              b = readByte()
            }
          }
        }
        attrs.toMap
      }
      def hasNext: Boolean = { if (nextElem == null && !done) advance(); nextElem != null }
      def next(): RawElem = {
        if (!hasNext) throw new NoSuchElementException
        val e = nextElem; nextElem = null; e
      }
    }
  }

  /** XML attribute-value decode: entities + whitespace normalization. */
  private[sources] def decodeAttr(s: String): String = {
    if (s.indexOf('&') < 0 && s.indexOf('\t') < 0 && s.indexOf('\n') < 0 && s.indexOf('\r') < 0)
      return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      // XML line-end normalization happens BEFORE attribute-value
      // normalization: a literal CRLF is one line end -> ONE space (the
      // StAX oracle path does the same; two spaces would diverge)
      if (c == '\r' && i + 1 < s.length && s.charAt(i + 1) == '\n') { sb.append(' '); i += 2 }
      else if (c == '\t' || c == '\n' || c == '\r') { sb.append(' '); i += 1 }
      else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0) { sb.append(c); i += 1 }
        else {
          val ent = s.substring(i + 1, semi)
          ent match {
            case "amp" => sb.append('&')
            case "lt" => sb.append('<')
            case "gt" => sb.append('>')
            case "quot" => sb.append('"')
            case "apos" => sb.append('\'')
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              sb.appendCodePoint(Integer.parseInt(ent.substring(2), 16))
            case _ if ent.startsWith("#") =>
              sb.appendCodePoint(Integer.parseInt(ent.substring(1)))
            case _ => sb.append('&').append(ent).append(';')
          }
          i = semi + 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // --------------------------------------------------------- discovery

  private def fs(path: String, conf: Configuration): FileSystem =
    new Path(path).getFileSystem(conf)

  /**
   * Source-file discovery (SRC-3, common.py:47-60): glob AS_{table}_2*.{ext}
   * case-insensitive extension; exactly one match required. Hadoop FS, so it
   * works on HDFS/S3 as well as local dirs.
   */
  def discoverFile(dir: String, table: String, ext: String,
      conf: Configuration = new Configuration()): String = {
    val f = fs(dir, conf)
    val found = Seq(ext.toLowerCase, ext.toUpperCase).flatMap { e =>
      f.globStatus(new Path(dir, s"AS_${table}_2*.$e")) match {
        case null => Nil
        case st => st.toSeq.map(_.getPath.toString)
      }
    }.distinct.sorted
    // distinct from the not-found case: callers with a registry fallback
    // (GarXmlSource.defnOf) must surface ambiguity, not silently fall back
    if (found.length > 1) throw new IllegalStateException(
      s"More than one file found for $table in $dir")
    if (found.isEmpty) throw new java.io.FileNotFoundException(
      s"Not found source file: $dir/AS_${table}_2*.$ext")
    found.head
  }

  /** Partition discovery (SRC-4, dump.py:12-14): numeric subdirectories. */
  def discoverRegions(sourceDir: String,
      conf: Configuration = new Configuration()): Seq[String] = {
    val f = fs(sourceDir, conf)
    f.listStatus(new Path(sourceDir)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.nonEmpty &&
        st.getPath.getName.forall(_.isDigit))
      .map(_.getPath.getName).sorted
  }

  /** Runtime definition for a table: discover + parse its XSD (SRC-2). The
    * XSD is authoritative for schema, entity tag and collection tag, exactly
    * like the reference (dump.py:60-61). */
  def definitionOf(schemaDir: String, table: String,
      conf: Configuration = new Configuration()): XsdSchema.Definition = {
    val entity = SchemaRegistry.entityOf(table)
    val xsdPath = discoverFile(schemaDir, entity, "xsd", conf)
    val in = fs(xsdPath, conf).open(new Path(xsdPath))
    // parse closes the stream on success; a PARSE FAILURE must not leak it
    try XsdSchema.parse(in)
    catch { case e: Throwable => try in.close() catch { case _: Throwable => }; throw e }
  }

  /**
   * Distributed read of one table across regions, schema-driven by the
   * runtime-parsed XSD. Output columns: XSD fields ++ (region, ord).
   * Delegates to the DataSource V2 connector (GarXmlSource) — splittable
   * InputPartitions, InternalRow production, pruning hooks; no RDD anywhere
   * in the ingest.
   *
   * @param chunkBytes byte-range split size; files larger than this are read
   *                   by multiple tasks (element-boundary resync at offsets).
   */
  def read(spark: SparkSession, sourceDir: String, table: String,
      regions: Seq[String] = Nil, schemaDir: String = null,
      chunkBytes: Long = 64L * 1024 * 1024,
      lexicalBooleans: Boolean = false): DataFrame = {
    var r = spark.read.format("gar-xml")
      .option("table", table)
      .option("chunkBytes", chunkBytes.toString)
      .option("lexicalBooleans", lexicalBooleans.toString)
    if (regions.nonEmpty) r = r.option("regions", regions.mkString(","))
    if (schemaDir != null) r = r.option("schemaDir", schemaDir)
    r.load(sourceDir)
  }

  /** Entity (row) tag fallback for a table (fixture tags; real reads derive
    * the tag from the XSD — xml.py:106-116). */
  def entityTag(table: String): String =
    XsdSchema.entityTagOf(SchemaRegistry.entityOf(table))

  /** Render fixture rows back to GAR-shaped XML (test/golden support). */
  def toXml(rows: Seq[Row], schema: StructType, collectionTag: String, tag: String): String = {
    val sb = new StringBuilder("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
    sb.append(s"<$collectionTag>\n")
    for (r <- rows) {
      sb.append(s"  <$tag")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val v = r.get(i)
        if (v != null) {
          val s = v match {
            case b: Boolean => if (b) "true" else "false"
            case other => other.toString
          }
          val escaped = s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace("\"", "&quot;")
            .replace("\t", "&#009;").replace("\n", "&#010;").replace("\r", "&#013;")
          sb.append(s""" ${f.name}="$escaped"""")
        }
      }
      sb.append(" />\n")
    }
    sb.append(s"</$collectionTag>\n")
    sb.toString
  }
}
