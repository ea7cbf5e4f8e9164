package graft.operators

import graft.expr.gf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/**
 * PERSISTED IVF index — the ANN-at-rest shape for a 100 TB corpus (you build
 * the index once; queries must not re-embed, re-cluster or re-scan the whole
 * corpus):
 *
 *  - `build`: coarse-quantize (sample + distributed Lloyd refinement), assign
 *    every vector to its ONE inverted list (per-row IvfProbes expression, no
 *    shuffle), and write the lists as parquet IDENTITY-PARTITIONED BY `cid`
 *    with the quantized vectors inline; centroids persist next to the lists.
 *  - `query`: load the (small, K x dim) centroid matrix, compute each
 *    query's nProbe lists, and read ONLY those partitions — the probed-cid
 *    set is bounded by K, so the IN-list is driver-sized and Catalyst turns
 *    it into PARTITION PRUNING on the store (verified in the spec via
 *    PartitionFilters). Exact quantized-cosine re-rank on the candidates.
 *
 * All reads force an explicit schema: partition-column type inference is
 * never trusted (see DocStore).
 */
object IvfIndex {

  private val listSchema = StructType(Seq(
    StructField("tid", LongType, nullable = false),
    StructField("q_t", ArrayType(LongType, containsNull = true), nullable = true),
    StructField("cid", IntegerType, nullable = false)))

  /** Idempotent once-per-sf build under `target/synth` (the DocStore.ensure
    * pattern, Hadoop FS throughout): an IVF index is built ONCE and queried
    * many times — rebuilding sample + Lloyd + the full list write inside
    * every bench/verify invocation was 4.1 s of the round-3 bench and the
    * wrong shape for an index-at-rest. A `_BUILT` marker commits the build;
    * a crash between data write and marker leaves no marker, so the next
    * call rebuilds with overwrite (torn-write healing, like Lineage). */
  def ensure(spark: SparkSession, sf: Double, corpus: => DataFrame,
      kCentroids: Int = 16, kmeansIters: Int = 1): String = {
    // the build parameters are part of the index IDENTITY: a marker keyed
    // by sf alone would silently serve a stale 16-centroid index to a
    // caller asking for 64 centroids
    val dir = s"target/synth/sf$sf/ivf_k${kCentroids}_i$kmeansIters"
    def done = StoreMarker.exists(spark, dir)
    if (!done) synchronized {
      if (!done) rebuild(spark, dir, corpus, kCentroids, kmeansIters)
    }
    dir
  }

  /** Build the index: inverted lists partitioned by cid + centroid matrix.
    * Building OVER an existing index drops its `_BUILT` marker before
    * touching data (a crash mid-overwrite must not leave a valid-looking
    * marker on a half-overwritten index); ensure()/rebuild() recreate it
    * after the write completes. */
  def build(corpus: DataFrame, dir: String, kCentroids: Int = 64,
      kmeansIters: Int = 1): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    // ALL read-only work (sampling, validation, Lloyd refinement) runs
    // BEFORE the marker drop: a rebuild attempt over an empty/bad corpus
    // must fail without invalidating the perfectly good existing index
    val sampled = Similarity.sampleCentroids(corpus, kCentroids)
    require(sampled.nonEmpty, "empty corpus")
    val cents =
      if (kmeansIters > 0) Similarity.refineCentroids(corpus, sampled, kmeansIters)
      else sampled
    StoreMarker.invalidate(spark, dir)
    corpus.select(col("tid"), gf.vec_quantize(col("vec")).as("q_t"),
        element_at(gf.ivf_probes(col("vec"), cents, 1), 1).as("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$dir/lists")
    writeCentroids(spark, s"$dir/centroids.txt", cents)
    Tombstones.clear(spark, dir) // fresh lists carry no retirees...
    new Path(dir, "incoming").getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(new Path(dir, "incoming"), true) // ...and no stale append batches
    cents
  }

  /** Append a batch of new vectors to the index at rest WITHOUT
    * re-clustering: assign each vector to its list under the PERSISTED
    * quantizer and commit the batch to `incoming/batch=<batchId>` via a
    * staging-dir + atomic rename (the streamDedup sink pattern) — a
    * replayed batch whose dir already committed writes nothing, so appends
    * are exactly-once and a torn write is invisible (staging only).
    * [[query]] unions committed incoming batches with the main lists;
    * [[compact]] folds them in. Quantizer drift across many appends is the
    * signal to [[rebuild]] (the skew soak measures that failure mode). */
  def append(spark: SparkSession, dir: String, vectors: DataFrame,
      batchId: Long): Unit = {
    val committed = new Path(dir, s"incoming/batch=$batchId")
    val fs = committed.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(committed)) return
    val cents = readCentroids(spark, s"$dir/centroids.txt")
    val staging = new Path(dir, s"incoming/.staging/$batchId")
    vectors.select(col("tid"), gf.vec_quantize(col("vec")).as("q_t"),
        element_at(gf.ivf_probes(col("vec"), cents, 1), 1).as("cid"))
      .write.mode("overwrite").parquet(staging.toString)
    fs.mkdirs(committed.getParent)
    if (!fs.rename(staging, committed))
      throw new java.io.IOException(s"could not commit IVF append batch $batchId")
  }

  /** All committed incoming batches (explicit schema; the hidden `.staging`
    * dir is excluded by the file index's dot-prefix filter). Empty DF when
    * none exist. */
  private def incoming(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir, "incoming")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val has = fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch="))
    if (has)
      Some(spark.read.schema(listSchema).parquet(s"$dir/incoming")
        .select(col("tid"), col("q_t"), col("cid")))
    else None
  }

  /** Retire vectors from the index (takedown / superseded embeddings):
    * tombstoned tids are anti-joined out of every [[query]] immediately;
    * storage is reclaimed by [[compact]] (or any rebuild). Same lifecycle
    * contract as [[MinhashIndex.retire]], same shared [[Tombstones]]
    * machinery. */
  def retire(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit =
    Tombstones.retire(spark, dir, ids, idCol)

  /** Fold committed incoming batches into the cid-partitioned lists and
    * drop tombstoned vectors, then clear both. The centroids are untouched
    * (compaction reclaims storage and restores full partition pruning;
    * re-clustering is [[rebuild]]'s job). Crash-safe via the marker
    * protocol: staged copy first, marker dropped only for the swap window,
    * torn states heal through ensure()'s rebuild. No-op when there is
    * nothing to fold or drop.
    *
    * Replacing a vector (re-ingest) is retire(old) -> compact() ->
    * append(new): a tombstone suppresses EVERY row of its tid, and unlike
    * [[MinhashIndex.append]] (whose max_by verification makes automatic
    * un-retire safe) IVF query results have no newest-row resolution, so
    * the old row must be physically gone before the new one lands. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inc = incoming(spark, dir)
    val hasTombs = Tombstones.resolve(spark, dir).isDefined
    if (inc.isEmpty && !hasTombs) return
    val base = spark.read.schema(listSchema).parquet(s"$dir/lists")
    val all = inc.map(base.unionByName(_)).getOrElse(base)
    val kept =
      if (hasTombs)
        all.join(Tombstones.read(spark, dir).select(col("id").as("tid")), Seq("tid"), "left_anti")
      else all
    val staged = new Path(dir, ".compact_lists")
    kept.write.mode("overwrite").partitionBy("cid").parquet(staged.toString)
    StoreMarker.invalidate(spark, dir)
    val lists = new Path(dir, "lists")
    fs.delete(lists, true)
    if (!fs.rename(staged, lists))
      throw new java.io.IOException(s"compact: could not swap $staged -> $lists")
    fs.delete(new Path(dir, "incoming"), true)
    Tombstones.clear(spark, dir)
    StoreMarker.commit(spark, dir)
  }

  /** Re-cluster + rewrite an existing index IN PLACE from the current
    * corpus — the quantizer-drift answer (a corpus that has drifted from
    * the centroids it was clustered under concentrates into few lists; the
    * skew soak measures that exact failure mode at 1.28x hot/balanced).
    * Crash-safe via the marker protocol: the marker is dropped first and
    * recreated only after the full rewrite, so a torn rebuild is healed by
    * the next ensure() rather than served. */
  def rebuild(spark: SparkSession, dir: String, corpus: DataFrame,
      kCentroids: Int = 16, kmeansIters: Int = 1): Array[Array[Float]] = {
    val cents = build(corpus, dir, kCentroids, kmeansIters)
    StoreMarker.commit(spark, dir)
    cents
  }

  /** Query the persisted index: partition-pruned candidate read + exact
    * re-rank. queries: (qid, vec). */
  def query(spark: SparkSession, dir: String, queries: DataFrame, k: Int,
      nProbe: Int = 8): DataFrame = {
    val cents = readCentroids(spark, s"$dir/centroids.txt")
    val probed = queries.select(col("qid"), gf.vec_quantize(col("vec")).as("q_q"),
      explode(gf.ivf_probes(col("vec"), cents, nProbe)).as("cid"))
    // the probed-cid set is bounded by K (the centroid count), so collecting
    // it is a driver-sized constant — and an IN-list literal is what Catalyst
    // prunes partitions with (a join would scan every list)
    val cids = probed.select("cid").distinct().collect().map(_.getInt(0)).sorted
    val cidIn = (df: DataFrame) =>
      df.where(col("cid").isin(cids.map(Integer.valueOf).toSeq: _*))
    // committed incoming batches union in (same cid predicate — their
    // files aren't cid-partitioned, so it is a filter rather than pruning,
    // bounded by compact() folding them into the main lists)
    val base = cidIn(spark.read.schema(listSchema).parquet(s"$dir/lists"))
    val withIncoming = incoming(spark, dir).map(inc => base.unionByName(cidIn(inc)))
      .getOrElse(base)
    // retired vectors are anti-joined out AFTER partition pruning (the
    // tombstone set is small — AQE broadcasts it; lifecycle-free reads keep
    // the exact original pruned plan)
    val lists = Tombstones.minus(spark, dir, withIncoming, "tid")
    // exact re-rank via the ONE shared output contract (Similarity.rerankTopK)
    Similarity.rerankTopK(probed.join(lists, "cid"), k)
  }

  /** The pruned scan for plan assertions (same predicate as `query`). */
  def prunedScan(spark: SparkSession, dir: String, cids: Seq[Int]): DataFrame =
    spark.read.schema(listSchema).parquet(s"$dir/lists")
      .where(col("cid").isin(cids.map(Integer.valueOf): _*))

  // --------------------------------------------------------- centroid files

  private def writeCentroids(spark: SparkSession, path: String,
      cents: Array[Array[Float]]): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val body = cents.map(_.mkString(",")).mkString("\n")
    val out = fs.create(p, true)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readCentroids(spark: SparkSession, path: String): Array[Array[Float]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 65536, false)
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    body.split("\n").map(_.split(",").map(_.toFloat))
  }
}
