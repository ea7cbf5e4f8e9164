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

  /** The full north-star per-document pipeline: anchor extraction ->
    * hash-geocode -> H3-analog cells res 7..11 + S2 level 11 -> broadcast
    * two-phase PIP join against region AND municipality polygons -> counts,
    * plus media-span explode -> tile parse -> per-tile histogram. */
  def headlinePipeline(spark: SparkSession, sf: Double): (Long, Long) = {
    import org.apache.spark.sql.functions._
    import graft.expr.gf
    val p = DocStore.ensure(spark, sf)
    // per-branch nested pruning (readDfPruned): the anchor/PIP branch never
    // touches media_ref; the tile branch never touches text (the fat column).
    // Catalyst can't push this through posexplode/array lambdas, so the read
    // schema declares it — the scans decode strictly the bytes each branch uses.
    val docsForAnchors = DocStore.readDfPruned(spark, p, Seq("kind", "text", "offset"))
    val docsForTiles = DocStore.readDfPruned(spark, p, Seq("kind", "media_ref", "offset"))
    val regions = DataGen.regionPolys(spark).toDF()
    val munis = DataGen.municipalityPolys(spark).toDF()

    val anchors = DocPipeline.docAnchors(docsForAnchors)
      .withColumn("cell8", gf.grid_cell(col("lat"), col("lon"), 8))
      .withColumn("cell9", gf.grid_cell(col("lat"), col("lon"), 9))
      .withColumn("cell10", gf.grid_cell(col("lat"), col("lon"), 10))
      .withColumn("cell11", gf.grid_cell(col("lat"), col("lon"), 11))
      .withColumn("s2", gf.s2_cell(col("lat"), col("lon"), 11))
    // No persist (recompute beats per-rep block-manager churn), and ONE
    // action: the region-count, municipality-count and tile-histogram
    // branches union into a single job so their stages schedule in parallel
    // instead of three serial scheduling waves.
    val regionCounts = graft.operators.SpatialJoin.pipJoin(
        anchors.select(col("doc_id"), col("lat"), col("lon")),
        regions.select(col("poly_id"), col("rings"), col("cell_cover")))
      .groupBy(col("poly_id")).agg(count(lit(1)).as("n"))
      .select(lit("region").as("kind"), col("n"))
    val muniCounts = graft.operators.SpatialJoin.pipJoin(
        anchors.select(col("doc_id"), col("lat"), col("lon")),
        munis.select(col("poly_id"), col("rings"), col("cell_cover")))
      .groupBy(col("poly_id")).agg(count(lit(1)).as("n"))
      .select(lit("muni").as("kind"), col("n"))
    val tileCounts = DocPipeline.mediaSpans(docsForTiles)
      .groupBy("tile_z", "tile").count()
      .select(lit("tile").as("kind"), col("count").as("n"))
    val rows = regionCounts.unionByName(muniCounts).unionByName(tileCounts).collect()
    val nAssigned = rows.filter(_.getString(0) == "region").map(_.getLong(1)).sum
    val nOther = rows.count(_.getString(0) != "region").toLong
    (nAssigned, nOther)
  }

  /** The north-rule metric pipeline, exactly as BASELINE.json words it:
    * "H3-indexed PIP spatial join + tile assignment" — anchor extraction ->
    * geocode -> cell encode -> broadcast two-phase PIP join vs region
    * polygons -> counts, plus media tile histogram; one action. (The full
    * headlinePipeline above additionally joins municipality polygons and
    * encodes 5 cell resolutions — a heavier superset.) */
  def northRulePipeline(spark: SparkSession, sf: Double): (Long, Long) = {
    import org.apache.spark.sql.functions._
    val p = DocStore.ensure(spark, sf)
    val regions = DataGen.regionPolys(spark).toDF()
    val anchors = DocPipeline.docAnchors(
      DocStore.readDfPruned(spark, p, Seq("kind", "text", "offset")))
    val regionCounts = graft.operators.SpatialJoin.pipJoin(
        anchors.select(col("doc_id"), col("lat"), col("lon")),
        regions.select(col("poly_id"), col("rings"), col("cell_cover")))
      .groupBy(col("poly_id")).agg(count(lit(1)).as("n"))
      .select(lit("region").as("kind"), col("n"))
    val tileCounts = DocPipeline.mediaSpans(
        DocStore.readDfPruned(spark, p, Seq("kind", "media_ref", "offset")))
      .groupBy("tile_z", "tile").count()
      .select(lit("tile").as("kind"), col("count").as("n"))
    val rows = regionCounts.unionByName(tileCounts).collect()
    val nAssigned = rows.filter(_.getString(0) == "region").map(_.getLong(1)).sum
    (nAssigned, rows.length.toLong)
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
    // materialise synth inputs AND the per-sf persisted indexes up front so
    // query timings measure queries, not first-run cache population; build
    // time is reported separately in the artifact ("build_sec"). prebuild
    // is per-item fault-tolerant (-1 = failed) — a broken store surfaces in
    // the queries that need it, never as a lost artifact
    val builds = SparkEntry.prebuild(spark, sfDir)
    // page-cache + JIT warmup: touch every input table and run one small
    // shuffle so the alphabetically-first query doesn't absorb session
    // warmup costs that belong to no query
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    spark.range(1000).groupBy(org.apache.spark.sql.functions.pmod(
      org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(7L))).count().count()
    // JIT/codegen warmup for the hot custom-expression stack (minhash /
    // shingle / jaccard): the alphabetically-early dedup queries otherwise
    // absorb the one-time compilation that belongs to no query
    try graft.operators.Dedup.minhashLshPairs(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(200),
      "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16,
      tau = 0.5, broadcastVerify = Some(true)).count()
    catch { case _: Throwable => () }

    // a failed query must never masquerade as a fast timing: errors are
    // collected and reported in an "errors" field of the bench JSON
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    builds.filter(_._2 < 0).foreach { case (k, _) =>
      errors(s"prebuild_$k") = "store build failed; dependent queries will error"
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(120)
      }
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
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val buildJson = builds.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"errors":$errJson,"build_sec":$buildJson,"sf":"$sfDir","headline_docs":$nDocs,"headline_sec":$headlineSec%.3f,"docs_per_sec":$docsPerSec%.0f}"""
    println(line)
    // machine-readable copy: sbt wraps stdout in [info] noise, so the driver's
    // JSON parse of the captured output can fail ("parsed": null in
    // BENCH_r03.json) — the file is the authoritative artifact. A bad output
    // path must not crash the bench AFTER all queries ran (stdout still
    // carries the line).
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_out.json")), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write bench artifact: ${e.getMessage}")
    }
    spark.stop()
  }
}
