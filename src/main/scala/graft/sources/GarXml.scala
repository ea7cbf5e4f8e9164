package graft.sources

import graft.model.SchemaRegistry
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

/**
 * GAR XML ingest (SURVEY.md SRC-1..4): the Spark re-expression of the
 * reference's streaming scan (/root/reference/ru_address/source/xml.py:19-38).
 *
 * Per-task pull parsing with StAX (javax.xml.stream, JDK built-in): each task
 * streams one XML file element by element — the same constant-memory property
 * as the reference's iterparse + buffer reclamation (xml.py:69-71), but one
 * task per (region, table) file, so ingest parallelism = number of files.
 *
 * Projection is schema-driven exactly like the reference (xml.py:25): the
 * registry's field list is iterated in order; missing XML attributes become
 * NULL, extra attributes are dropped.
 */
object GarXml {

  /** Parse a single XML stream into typed Rows per the table schema. */
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
    * them in the registry's Spark types). */
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

  /** Entity (row) tag for a table: GAR files use singular-ish element names;
    * the registry supplies them the way the XSD's entity tag would
    * (xml.py:106-116). */
  def entityTag(table: String): String = SchemaRegistry.entityOf(table) match {
    case "ADDR_OBJ" => "OBJECT"
    case "ADDR_OBJ_DIVISION" => "ITEM"
    case "ADDR_OBJ_TYPES" => "ADDRESSOBJECTTYPE"
    case "ADM_HIERARCHY" | "MUN_HIERARCHY" => "ITEM"
    case "APARTMENT_TYPES" => "APARTMENTTYPE"
    case "APARTMENTS" => "APARTMENT"
    case "CARPLACES" => "CARPLACE"
    case "CHANGE_HISTORY" => "ITEM"
    case "HOUSE_TYPES" => "HOUSETYPE"
    case "HOUSES" => "HOUSE"
    case "NORMATIVE_DOCS" => "NORMDOC"
    case "NORMATIVE_DOCS_KINDS" => "NDOCKIND"
    case "NORMATIVE_DOCS_TYPES" => "NDOCTYPE"
    case "OBJECT_LEVELS" => "OBJECTLEVEL"
    case "OPERATION_TYPES" => "OPERATIONTYPE"
    case "PARAM" => "PARAM"
    case "PARAM_TYPES" => "PARAMTYPE"
    case "REESTR_OBJECTS" => "OBJECT"
    case "ROOM_TYPES" => "ROOMTYPE"
    case "ROOMS" => "ROOM"
    case "STEADS" => "STEAD"
    case e => e
  }

  /**
   * Source-file discovery (SRC-3, common.py:47-60): glob AS_{table}_2*.{ext}
   * case-insensitive extension; exactly one match required.
   */
  def discoverFile(dir: String, table: String, ext: String): String = {
    val d = new java.io.File(dir)
    val pattern = ("(?i)AS_" + java.util.regex.Pattern.quote(table) + "_2.*\\." + ext + "$").r
    val found = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => pattern.findFirstIn(f.getName).isDefined)
      .map(_.getAbsolutePath).sorted
    if (found.length > 1) throw new java.io.FileNotFoundException(
      s"More than one file found for $table in $dir")
    if (found.isEmpty) throw new java.io.FileNotFoundException(
      s"Not found source file: $dir/AS_${table}_2*.$ext")
    found.head
  }

  /** Partition discovery (SRC-4, dump.py:12-14): numeric subdirectories. */
  def discoverRegions(sourceDir: String): Seq[String] = {
    val d = new java.io.File(sourceDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.forall(_.isDigit))
      .map(_.getName).sorted.toSeq
  }

  /**
   * Distributed read of one table across regions: one task per (region, file).
   * Files are claimed via binaryFile-style streaming inside mapPartitions, so
   * a 30 GB region file never materialises in memory (SRC-1's constant-memory
   * property per task).
   */
  def read(spark: SparkSession, sourceDir: String, table: String,
      regions: Seq[String] = Nil): DataFrame = {
    val schema = SchemaRegistry.schemaOf(table)
    val tag = entityTag(table)
    val isCommon = SchemaRegistry.commonTables.exists(_._1 == table)
    val files: Seq[(String, String)] =
      if (isCommon) Seq("" -> discoverFile(sourceDir, table, "xml"))
      else {
        val regs = if (regions.nonEmpty) regions else discoverRegions(sourceDir)
        regs.map(r => r -> discoverFile(s"$sourceDir/$r", table, "xml"))
      }
    val withRegion = StructType(schema.fields :+ StructField("region", StringType, nullable = true))
    val rdd = spark.sparkContext
      .parallelize(files, math.max(1, files.size))
      .flatMap { case (region, path) =>
        val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(path))
        parseStream(in, schema, tag).map(r =>
          Row.fromSeq(r.toSeq :+ (if (region.isEmpty) null else region)))
      }
    spark.createDataFrame(rdd, withRegion)
  }

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
