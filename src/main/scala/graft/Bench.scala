package graft

import graft.operators.DocPipeline
import graft.sources.DocStore
import graft.synth.DataGen
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs every SparkEntry query once on
 * SPARK_GRAFT_SF_DIR plus the headline pipeline (geocode -> cell encode ->
 * PIP spatial join -> tile assignment over the interleaved doc table), and
 * prints ONE JSON line with per-query seconds, total, and the north-rule
 * headline docs/sec.
 */
object Bench {

  def headlinePipeline(spark: SparkSession, sf: Double): (Long, Long) = {
    val p = DocStore.ensure(spark, sf)
    val docs = DocStore.readDf(spark, p)
    val polys = DataGen.regionPolys(spark).toDF()
    // full pipeline: anchors PIP-joined to regions + media spans tiled
    val regionCounts = DocPipeline.regionDocCounts(docs, polys)
    val tileCounts = DocPipeline.mediaSpans(docs)
      .groupBy("tile_z", "tile").count()
    val nAssigned = regionCounts.agg(org.apache.spark.sql.functions.sum("doc_count"))
      .collect()(0).getLong(0)
    val nTiles = tileCounts.count()
    (nAssigned, nTiles)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expr.gf.registerAll(spark)

    val sf = SparkEntry.sfOf(sfDir)
    // materialise synth inputs up front so query timings measure compute
    DocStore.ensure(spark, sf)

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // headline: docs/sec through geocode+cell+PIP+tile (north-rule metric)
    val warm = headlinePipeline(spark, sf) // warm file cache + JIT
    val t0 = System.nanoTime()
    val (nDocs, _) = headlinePipeline(spark, sf)
    val headlineSec = (System.nanoTime() - t0) / 1e9
    val docsPerSec = nDocs / headlineSec

    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","headline_docs":$nDocs,"headline_sec":$headlineSec%.3f,"docs_per_sec":$docsPerSec%.0f}""")
    spark.stop()
  }
}
