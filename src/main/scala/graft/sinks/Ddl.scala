package graft.sinks

import graft.model.SchemaRegistry
import org.apache.spark.sql.types._

/**
 * StructType -> CREATE TABLE DDL (SURVEY.md DDL-1/2) for the three target
 * platforms, mirroring the reference's XSLT templates
 * (resources/templates/{mysql,postgres,clickhouse}.schema.xsl and
 * *.index.xsl): type map, NOT NULL / NULL DEFAULT NULL, column/table
 * comments, PRIMARY KEY clause after the last column, DROP TABLE toggle,
 * ENGINE parameter. Pure driver-side Scala — no cluster work.
 */
object Ddl {

  sealed trait Dialect { def name: String }
  case object MySql extends Dialect { val name = "mysql" }
  case object Postgres extends Dialect { val name = "psql" }
  case object ClickHouse extends Dialect { val name = "clickhouse" }

  case class Options(
      includeDrop: Boolean = true,
      tableEngine: String = "", // "" -> per-dialect default (schema.py:106,146)
      includeKeys: Boolean = true,
      tableComment: String = "")

  private def engineOf(d: Dialect, o: Options): String =
    if (o.tableEngine.nonEmpty) o.tableEngine
    else d match {
      case MySql => "MyISAM"
      case ClickHouse => "MergeTree"
      case Postgres => ""
    }

  private def maxLen(f: StructField): Int =
    if (f.metadata.contains("maxLength")) f.metadata.getLong("maxLength").toInt else 0

  private def commentOf(f: StructField): String =
    if (f.metadata.contains("comment")) f.metadata.getString("comment") else ""

  /** Type map per SURVEY.md §1.2 (mysql.schema.xsl:21-62 et al.). */
  def columnType(d: Dialect, f: StructField): String = {
    val len = maxLen(f)
    (d, f.dataType) match {
      case (MySql, ShortType) => "INT(5)"
      case (MySql, IntegerType) => "INT(10)"
      case (MySql, LongType) => "INT(19)"
      case (MySql, ByteType) => "INT(1)"
      case (MySql, BooleanType) => "INT(1)"
      case (MySql, DateType) => "DATE"
      case (MySql, StringType) if len > 0 && len <= 255 => s"VARCHAR($len)"
      case (MySql, StringType) if len > 255 => "TEXT"
      case (MySql, StringType) => "TEXT"
      case (MySql, _) => "VARCHAR(128)"

      case (Postgres, ShortType) => "smallint"
      case (Postgres, IntegerType) => "integer"
      case (Postgres, LongType) => "bigint"
      case (Postgres, ByteType) => "smallint"
      case (Postgres, BooleanType) => "boolean"
      case (Postgres, DateType) => "date"
      case (Postgres, StringType) if len > 0 && len <= 255 => s"varchar($len)"
      case (Postgres, StringType) => "text"
      case (Postgres, _) => "varchar(128)"

      case (ClickHouse, ShortType) => "Int16"
      case (ClickHouse, IntegerType) => "Int32"
      case (ClickHouse, LongType) => "Int64"
      case (ClickHouse, ByteType) => "Int8"
      case (ClickHouse, BooleanType) => "Bool"
      case (ClickHouse, DateType) => "Date"
      case (ClickHouse, StringType) => "String"
      case (ClickHouse, _) => "String"
    }
  }

  private def q(d: Dialect, ident: String): String = d match {
    case Postgres => s""""$ident""""
    case _ => s"`$ident`"
  }

  /** CREATE TABLE text for one table. */
  def createTable(table: String, schema: StructType, d: Dialect,
      opts: Options = Options(), primaryKey: Option[String] = None): String = {
    val sb = new StringBuilder
    if (opts.includeDrop)
      sb.append(s"DROP TABLE IF EXISTS ${q(d, table)};\n")
    sb.append(s"CREATE TABLE ${q(d, table)} (\n")

    val pk = if (opts.includeKeys) primaryKey else None
    val cols = schema.fields.map { f =>
      val nullability = if (f.nullable) " NULL DEFAULT NULL" else " NOT NULL"
      val comment = d match {
        case Postgres => "" // postgres comments go in COMMENT ON statements
        case _ => if (commentOf(f).nonEmpty) s" COMMENT '${commentOf(f)}'" else ""
      }
      s"  ${q(d, f.name)} ${columnType(d, f)}$nullability$comment"
    }
    sb.append(cols.mkString(",\n"))
    pk.foreach(k => sb.append(s",\n  PRIMARY KEY (${q(d, k)})"))
    sb.append("\n)")

    d match {
      case Postgres =>
        sb.append(";\n")
        if (opts.tableComment.nonEmpty)
          sb.append(s"""\nCOMMENT ON TABLE "$table" IS '${opts.tableComment}';\n""")
        for (f <- schema.fields if commentOf(f).nonEmpty)
          sb.append(s"""COMMENT ON COLUMN "$table"."${f.name}" IS '${commentOf(f)}';\n""")
      case MySql =>
        sb.append(s" ENGINE = ${engineOf(d, opts)} ")
        if (opts.tableComment.nonEmpty) sb.append(s"COMMENT='${opts.tableComment}'")
        sb.append("; \n")
      case ClickHouse =>
        sb.append(s" ENGINE = ${engineOf(d, opts)} ")
        if (opts.tableComment.nonEmpty) sb.append(s"COMMENT '${opts.tableComment}'")
        sb.append("; \n")
    }
    sb.append("\n")
    sb.toString
  }

  /** Full GAR schema dump: all 28 logical tables in output order. */
  def createAll(d: Dialect, opts: Options = Options()): String =
    SchemaRegistry.knownTables.map { case (table, _) =>
      createTable(table, SchemaRegistry.schemaOf(table), d, opts,
        Some(SchemaRegistry.primaryKey(table)))
    }.mkString
}
