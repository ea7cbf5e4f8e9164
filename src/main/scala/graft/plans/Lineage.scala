package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Per-partition checkpoint lineage + resume (north rule: "resumable from
 * checkpoint with per-partition lineage + metrics").
 *
 * A stage writes its output partitioned by `region`, then records one
 * manifest row per partition under `_progress/` (rows, wall-clock, stage id).
 * Resume = anti-join the input's partition list against the done-manifest:
 * only missing regions are recomputed — the Spark analog of the reference's
 * region-at-a-time loop, made restartable.
 *
 * The manifest is itself parquet, so at 10^12-doc scale the "what's done"
 * check is a metadata-sized read, not a data scan.
 */
object Lineage {

  case class PartitionRecord(stage: String, region: String, rows: Long, wallMs: Long)

  def progressPath(outPath: String): String = s"$outPath/_progress"

  /** Regions already completed for a stage (empty on first run). */
  def doneRegions(spark: SparkSession, outPath: String, stage: String): Set[String] = {
    val p = progressPath(outPath)
    if (!new java.io.File(p).exists()) return Set.empty
    import spark.implicits._
    spark.read.parquet(p)
      .where(col("stage") === stage)
      .select("region").as[String].collect().toSet
  }

  /** Record completion of a set of regions with row counts + timing. */
  def record(spark: SparkSession, outPath: String, stage: String,
      counts: Map[String, Long], wallMs: Long): Unit = {
    import spark.implicits._
    counts.toSeq.map { case (r, n) => PartitionRecord(stage, r, n, wallMs) }
      .toDF()
      .write.mode(SaveMode.Append).parquet(progressPath(outPath))
  }

  /**
   * Run `transform` region-at-a-restartable-batch: skips regions already in
   * the progress manifest, processes the rest (all at once — Spark
   * parallelism stays intact), appends their output partitioned by region,
   * and records lineage. Returns the set of regions processed this run.
   */
  def runResumable(spark: SparkSession, input: DataFrame, outPath: String,
      stage: String)(transform: DataFrame => DataFrame): Set[String] = {
    val done = doneRegions(spark, outPath, stage)
    val all = input.select("region").distinct()
      .collect().map(_.getString(0)).toSet
    val todo = all -- done
    if (todo.isEmpty) return Set.empty

    val t0 = System.currentTimeMillis()
    val slice = input.where(col("region").isin(todo.toSeq: _*))
    val out = transform(slice)
    require(out.columns.contains("region"),
      "resumable transform must preserve the region partition column")
    out.write.mode(SaveMode.Append).partitionBy("region").parquet(s"$outPath/data")

    // read back with the transform's schema: partition-dir type inference
    // would coerce zero-padded region strings to ints
    val counts = spark.read.schema(out.schema).parquet(s"$outPath/data")
      .where(col("region").isin(todo.toSeq: _*))
      .groupBy("region").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    record(spark, outPath, stage, counts, System.currentTimeMillis() - t0)
    todo
  }

  /** The lineage/metrics view for inspection. */
  def progress(spark: SparkSession, outPath: String): DataFrame = {
    val p = progressPath(outPath)
    if (new java.io.File(p).exists()) spark.read.parquet(p)
    else spark.emptyDataFrame
  }
}
