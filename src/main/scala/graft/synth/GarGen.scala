package graft.synth

import graft.geo.Rng
import graft.model.SchemaRegistry
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Deterministic GAR-shaped fixture rows (FIXTURES.md §C): typed rows matching
 * the registry schemas, with escape-provoking characters (quotes, backslashes,
 * tabs) mixed into string fields to exercise every dump encode path
 * (/root/reference/ru_address/source/xml.py:25-38, dump.py:124-232).
 */
object GarGen {

  private val NamePool = Vector(
    "Николаевка", "Красный Яр \"Южный\"", "Back\\slash", "ул. Мира",
    "О'Хара", "с.Ильинка", "Tab\tSep", "Plain", "имени В. И. Чапаева",
    "пос. Зелёный, д.7",
    // literal bool words in a *string* field: the reference bool-encodes the
    // strings "true"/"false" in ANY column (source/xml.py:29-32), so parity
    // fixtures must exercise that path
    "true", "false")

  private def seedOf(table: String, region: String, row: Long, fieldIdx: Int): Long =
    graft.geo.TextAlgos.fnv1a64(s"$table|$region") * 1000003L + row * 131L + fieldIdx

  def value(f: StructField, table: String, region: String, rowIdx: Long, fieldIdx: Int): Any = {
    val seed = seedOf(table, region, rowIdx, fieldIdx)
    // ~20% nulls for nullable fields
    if (f.nullable && Rng.uniform(seed * 7 + 1) < 0.2) null
    else f.dataType match {
      case LongType => 100000L + rowIdx * 31 + fieldIdx
      case IntegerType => (1 + (Rng.uniformInt(seed, 1000000))).asInstanceOf[Any]
      case ShortType => (1 + Rng.uniformInt(seed, 100)).toShort
      case ByteType => Rng.uniformInt(seed, 2).toByte
      case BooleanType => Rng.uniform(seed) < 0.5
      case DateType => java.sql.Date.valueOf(java.time.LocalDate.of(2021, 1, 1)
        .plusDays(Rng.uniformInt(seed, 1500).toLong))
      case StringType => NamePool(Rng.uniformInt(seed, NamePool.length))
      case other => sys.error(s"unexpected GAR field type $other")
    }
  }

  def rows(table: String, region: String, n: Int): Seq[Row] = {
    val schema = SchemaRegistry.schemaOf(table)
    (0L until n.toLong).map { i =>
      Row.fromSeq(schema.fields.zipWithIndex.map { case (f, fi) =>
        value(f, table, region, i, fi)
      }.toSeq)
    }
  }

  /** Fixture DataFrame for one (table, region) slice, in generation order. */
  def df(spark: SparkSession, table: String, region: String, n: Int): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows(table, region, n).asJava, SchemaRegistry.schemaOf(table))
  }
}
