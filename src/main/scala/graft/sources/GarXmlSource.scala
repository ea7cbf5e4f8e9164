package graft.sources

import graft.model.{SchemaRegistry, XsdSchema}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration
import java.util

/**
 * DataSource V2 connector for GAR XML (SRC-1 packaged the idiomatic Spark
 * way): `spark.read.format("graft.sources.GarXmlSource")
 * .option("table", "ADDR_OBJ").load(sourceDir)`.
 *
 *  - schema inferred from the runtime-parsed XSD (SRC-2), registry fallback;
 *  - one InputPartition per (file, byte-range chunk): splittable ingest with
 *    element-boundary resync, parallelism >= cores not <= files;
 *  - column pruning pushed into the reader (SupportsPushDownRequiredColumns):
 *    unrequested attributes are never cast, `ord`/`region` only materialised
 *    when asked for;
 *  - rows produced as InternalRow (no Row->InternalRow conversion layer).
 *
 * Options: table (required), regions (csv, default: discover), schemaDir
 * (default: source path), chunkBytes (default 64 MB).
 */
class GarXmlSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "gar-xml"

  private def defnOf(options: CaseInsensitiveStringMap): (XsdSchema.Definition, String) = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("gar-xml: .load(sourceDir) is required"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("gar-xml: option 'table' is required"))
    val schemaDir = Option(options.get("schemaDir")).getOrElse(path)
    val defn =
      try GarXml.definitionOf(schemaDir, table)
      catch { case _: java.io.FileNotFoundException =>
        XsdSchema.Definition(
          XsdSchema.collectionTagOf(SchemaRegistry.entityOf(table)),
          XsdSchema.entityTagOf(SchemaRegistry.entityOf(table)),
          SchemaRegistry.schemaOf(table).fields.toSeq, "")
      }
    (defn, table)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (defn, _) = defnOf(options)
    StructType(defn.fields ++ Seq(
      StructField("region", StringType, nullable = true),
      StructField("ord", LongType, nullable = false)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val (defn, table) = defnOf(options)
    new GarXmlTable(table, defn, schema, options)
  }

  override def supportsExternalMetadata(): Boolean = false
}

class GarXmlTable(tableName: String, defn: XsdSchema.Definition,
    tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = s"gar_xml_$tableName"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new GarXmlScanBuilder(tableName, defn, tableSchema, options)
}

class GarXmlScanBuilder(table: String, defn: XsdSchema.Definition,
    full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GarXmlScan(table, defn, required, options)
}

class GarXmlScan(table: String, defn: XsdSchema.Definition,
    required: StructType, options: CaseInsensitiveStringMap) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GarXmlScan(table=$table, columns=${required.fieldNames.mkString(",")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val sourceDir = options.get("path")
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val chunkBytes = Option(options.get("chunkBytes")).map(_.toLong).getOrElse(64L * 1024 * 1024)
    val isCommon = SchemaRegistry.commonTables.exists(_._1 == table)
    val files: Seq[(String, String)] =
      if (isCommon) Seq("" -> GarXml.discoverFile(sourceDir, table, "xml", conf))
      else {
        val regs = Option(options.get("regions")).map(_.split(",").toSeq.map(_.trim))
          .getOrElse(GarXml.discoverRegions(sourceDir, conf))
        regs.map(r => r -> GarXml.discoverFile(s"$sourceDir/$r", table, "xml", conf))
      }
    files.flatMap { case (region, path) =>
      val len = new Path(path).getFileSystem(conf).getFileStatus(new Path(path)).getLen
      val n = math.max(1L, (len + chunkBytes - 1) / chunkBytes)
      (0L until n).map(i =>
        GarXmlInputPartition(region, path, i * chunkBytes, math.min(len, (i + 1) * chunkBytes)))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    GarXmlReaderFactory(defn.entityTag, required, conf)
  }
}

case class GarXmlInputPartition(region: String, path: String, start: Long, end: Long)
    extends InputPartition

case class GarXmlReaderFactory(entityTag: String, required: StructType,
    conf: SerializableConfiguration) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GarXmlInputPartition]
    new PartitionReader[InternalRow] {
      private val hPath = new Path(p.path)
      private val stream = {
        val s = hPath.getFileSystem(conf.value).open(hPath)
        if (p.start > 0) s.seek(p.start)
        s
      }
      private val elems = GarXml.scanElements(stream, p.start, p.end, entityTag)
      private var current: InternalRow = _

      override def next(): Boolean =
        if (!elems.hasNext) false
        else {
          val e = elems.next()
          current = toInternal(e)
          true
        }

      private def toInternal(e: GarXml.RawElem): InternalRow = {
        val vals = new Array[Any](required.length)
        var i = 0
        while (i < required.length) {
          val f = required.fields(i)
          vals(i) = f.name match {
            case "region" => if (p.region.isEmpty) null else UTF8String.fromString(p.region)
            case "ord" => e.offset
            case n => e.attrs.get(n) match {
              case None => null
              case Some(v) => f.dataType match {
                case StringType => UTF8String.fromString(v)
                case LongType => v.toLong
                case IntegerType => v.toInt
                case ShortType => v.toShort
                case ByteType => v.toByte
                case BooleanType => v == "true" || v == "1"
                case DateType => java.time.LocalDate.parse(v).toEpochDay.toInt
                case other => throw new IllegalStateException(s"unexpected GAR type $other")
              }
            }
          }
          i += 1
        }
        InternalRow.fromSeq(vals.toSeq)
      }

      override def get(): InternalRow = current
      override def close(): Unit = stream.close()
    }
  }
}
