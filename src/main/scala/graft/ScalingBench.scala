package graft

import org.apache.spark.sql.SparkSession

/**
 * Two-parallelism scaling evidence (BASELINE.json north rule: throughput
 * scaling efficiency >= 0.8 from N to 4N executors; sandbox substitute per
 * the driver note: the same job at local[N] vs local[4N] on identical input).
 *
 * Runs the headline pipeline (geocode -> cell encode -> broadcast PIP join ->
 * tile assignment) at both parallelism levels, 1 warmup + `reps` timed runs
 * each (median reported), prints one JSON line.
 */
object ScalingBench {

  private def run(master: String, cores: Int, sf: Double, reps: Int): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.DocStore.ensure(spark, sf)
    var nDocs = 0L
    val times = (0 to reps).map { _ =>
      val t0 = System.nanoTime()
      val (n, _) = Bench.headlinePipeline(spark, sf)
      nDocs = n
      (System.nanoTime() - t0) / 1e9
    }.drop(1).sorted // drop warmup
    spark.stop()
    (times(times.length / 2), nDocs)
  }

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0).toDouble else 0.1
    val n = if (args.length > 1) args(1).toInt else 8
    val reps = if (args.length > 2) args(2).toInt else 3

    val (tN, docs) = run(s"local[$n]", n, sf, reps)
    val (t4N, _) = run(s"local[${4 * n}]", 4 * n, sf, reps)
    val speedup = tN / t4N
    val efficiency = speedup / 4.0
    println(
      f"""{"sf":$sf,"docs":$docs,"cores_n":$n,"cores_4n":${4 * n},"sec_n":$tN%.3f,"sec_4n":$t4N%.3f,"docs_per_sec_n":${docs / tN}%.0f,"docs_per_sec_4n":${docs / t4N}%.0f,"speedup":$speedup%.3f,"scaling_efficiency":$efficiency%.3f}""")
  }
}
