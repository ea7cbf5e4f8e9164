package graft.sinks

import graft.model.SchemaRegistry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/**
 * Output-mode router (SURVEY.md OUT-1..4; /root/reference/ru_address/
 * output.py:9-189): `direct` (one file), `per_region`, `per_table`,
 * `region_tree` (source-mirroring, the default). Emission order follows
 * ORD-1: common tables first (registry order), then regions in sorted order,
 * each with its region tables in registry order.
 *
 * Two execution paths:
 *  - driver-streamed (`write`): slices stream through toLocalIterator in
 *    output order — matches the reference's sequential single-file semantics
 *    for the concatenated modes; constant memory (partition at a time).
 *  - executor-parallel (`regionTreeParallel`): region_tree only — each region
 *    partition formats + writes its own file, no driver bottleneck. This is
 *    the 100 TB path; the driver-streamed path exists for byte-conformance.
 */
object DumpJob {

  sealed trait Mode
  case object Direct extends Mode
  case object PerRegion extends Mode
  case object PerTable extends Mode
  case object RegionTree extends Mode

  /** Provider: (table, Some(region) | None for common) -> ordered slice. */
  type SliceProvider = (String, Option[String]) => DataFrame

  case class Config(
      tables: Seq[String],
      regions: Seq[String],
      dialect: Dump.Dialect,
      mode: Mode = RegionTree,
      includeMeta: Boolean = true,
      batchSize: Int = 500)

  private def commonTables(cfg: Config): Seq[String] =
    SchemaRegistry.commonTables.map(_._1).filter(cfg.tables.contains)

  private def regionTables(cfg: Config): Seq[String] =
    SchemaRegistry.regionTables.map(_._1).filter(cfg.tables.contains)

  private def newWriter(path: String): BufferedWriter = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    new BufferedWriter(new OutputStreamWriter(Files.newOutputStream(p), StandardCharsets.UTF_8))
  }

  private def streamSlice(w: BufferedWriter, df: DataFrame, table: String, cfg: Config): Unit = {
    val fields = df.schema.fieldNames.toSeq
    val it = df.toLocalIterator()
    val rows = new Iterator[org.apache.spark.sql.Row] {
      def hasNext: Boolean = it.hasNext
      def next(): org.apache.spark.sql.Row = it.next()
    }
    Dump.formatRows(rows, fields, table, cfg.dialect, cfg.batchSize).foreach(w.write)
  }

  private def meta(w: BufferedWriter, cfg: Config, s: String): Unit =
    if (cfg.includeMeta) w.write(s)

  /** Driver-streamed dump in any mode. Returns the list of files written. */
  def write(provider: SliceProvider, outPath: String, cfg: Config): Seq[String] = {
    val ext = cfg.dialect.extension
    val regions = cfg.regions.sorted
    val files = scala.collection.mutable.ArrayBuffer.empty[String]

    def withFile(path: String)(body: BufferedWriter => Unit): Unit = {
      val w = newWriter(path)
      try {
        meta(w, cfg, Dump.composeCopyright())
        meta(w, cfg, cfg.dialect.header)
        body(w)
        meta(w, cfg, cfg.dialect.footer)
      } finally w.close()
      files += path
    }

    cfg.mode match {
      case Direct =>
        withFile(s"$outPath.$ext") { w =>
          for (t <- commonTables(cfg)) {
            meta(w, cfg, Dump.composeTableSeparator(t, None))
            streamSlice(w, provider(t, None), t, cfg)
          }
          for (r <- regions; t <- regionTables(cfg)) {
            meta(w, cfg, Dump.composeTableSeparator(t, Some(r)))
            streamSlice(w, provider(t, Some(r)), t, cfg)
          }
        }
      case PerTable =>
        for (t <- commonTables(cfg))
          withFile(s"$outPath/$t.$ext")(w => streamSlice(w, provider(t, None), t, cfg))
        for (t <- regionTables(cfg))
          withFile(s"$outPath/$t.$ext") { w =>
            for (r <- regions) {
              meta(w, cfg, Dump.composeTableSeparator(t, Some(r)))
              streamSlice(w, provider(t, Some(r)), t, cfg)
            }
          }
      case PerRegion =>
        if (commonTables(cfg).nonEmpty)
          withFile(s"$outPath/_common.$ext") { w =>
            for (t <- commonTables(cfg)) {
              meta(w, cfg, Dump.composeTableSeparator(t, None))
              streamSlice(w, provider(t, None), t, cfg)
            }
          }
        for (r <- regions)
          withFile(s"$outPath/$r.$ext") { w =>
            for (t <- regionTables(cfg)) {
              meta(w, cfg, Dump.composeTableSeparator(t, Some(r)))
              streamSlice(w, provider(t, Some(r)), t, cfg)
            }
          }
      case RegionTree =>
        for (t <- commonTables(cfg))
          withFile(s"$outPath/$t.$ext")(w => streamSlice(w, provider(t, None), t, cfg))
        for (r <- regions; t <- regionTables(cfg))
          withFile(s"$outPath/$r/$t.$ext")(w => streamSlice(w, provider(t, Some(r)), t, cfg))
    }
    files.toSeq
  }

  /**
   * Executor-parallel region_tree dump for one region-partitioned table:
   * one task per region writes `{out}/{region}/{TABLE}.{ext}` directly.
   * `df` must carry `region` and an `ord` ordering column.
   */
  def regionTreeParallel(spark: SparkSession, df: DataFrame, table: String,
      outPath: String, cfg: Config): Unit = {
    val dialect = cfg.dialect
    val batch = cfg.batchSize
    val dataFields = df.schema.fieldNames.filterNot(n => n == "region" || n == "ord").toSeq
    val ext = dialect.extension
    df.repartition(col("region"))
      .sortWithinPartitions(col("region"), col("ord"))
      .select((col("region") +: col("ord") +: dataFields.map(col)): _*)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val buffered = it.buffered
          val region = buffered.head.getString(0)
          val w = newWriter(s"$outPath/$region/$table.$ext")
          try {
            val rows = buffered.map(r =>
              org.apache.spark.sql.Row.fromSeq(r.toSeq.drop(2)))
            Dump.formatRows(rows, dataFields, table, dialect, batch).foreach(w.write)
          } finally w.close()
        }
      }
  }
}
