package graft.operators

import graft.expr.gf
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets

/**
 * PERSISTED minhash-LSH index — incremental dedup at rest. A 100 TB corpus
 * is not re-paired when a new shard arrives: the corpus's band keys and
 * per-doc shingle-hash arrays are written ONCE; deduping a new batch is
 *
 *   new-batch bands  ⋈  stored bands   (ids-only equi-join)
 *   + new-batch self-join               (new×new pairs)
 *   → exact Jaccard verification        (stored shingle arrays re-read only
 *                                        for candidate participants)
 *
 * which touches O(|new| + candidates) rows instead of O(|corpus|). The
 * result equals the full-batch [[Dedup.minhashLshPairs]] over old ∪ new,
 * restricted to pairs involving a new document (same deterministic hash
 * family + the SAME immutable plan, persisted with the index) — an
 * engine-parity invariant the oracle pins.
 *
 * Layout under `dir`: `bands/` (band, id), `shingles/` (id, sh sorted
 * hashes), `plan.txt` (shingleN,numHashes,bands — queries and appends MUST
 * reuse it; a mixed-plan index is garbage), `_BUILT` marker committed last
 * (torn-write healing, as IvfIndex/Lineage).
 */
object MinhashIndex {

  private val bandSchema = StructType(Seq(
    StructField("band", LongType, nullable = false),
    StructField("id", LongType, nullable = false)))
  private val shingleSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("sh", ArrayType(LongType, containsNull = false), nullable = true)))

  /** Build the index over `docs` (idCol must be LongType). 0-knobs derive
    * the plan from [[Dedup.minhashPlan]] on the corpus size (the count is
    * skipped when the caller supplies every knob). */
  def build(docs: DataFrame, idCol: String, textCol: String, dir: String,
      shingleN: Int = 0, numHashes: Int = 0, bands: Int = 0): Dedup.MinhashPlan = {
    val spark = docs.sparkSession
    val plan =
      if (shingleN > 0 && numHashes > 0 && bands > 0)
        Dedup.MinhashPlan(shingleN, numHashes, bands)
      else {
        val auto = Dedup.minhashPlan(docs.count())
        Dedup.MinhashPlan(
          if (shingleN > 0) shingleN else auto.shingleN,
          if (numHashes > 0) numHashes else auto.numHashes,
          if (bands > 0) bands else auto.bands)
      }
    writeParts(docs, idCol, textCol, dir, plan, overwrite = true)
    writePlan(spark, s"$dir/plan.txt", plan)
    val marker = new Path(dir, "_BUILT")
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration).create(marker, true).close()
    plan
  }

  /** Append a new batch to the index (AFTER it has been deduped via
    * [[queryNew]] — the index stores whatever it is given). Uses the
    * persisted plan.
    *
    * Crash semantics (no marker covers appends): shingles are written
    * BEFORE bands, so a torn append leaves shingle rows with no band rows —
    * the batch is merely invisible to candidate generation (fail-safe), not
    * silently pair-dropping (band rows whose shingle lookup misses would
    * be). Re-running the append after a crash is safe: duplicate band rows
    * collapse in the candidate distinct and duplicate shingle rows in the
    * per-id lookup aggregate. */
  def append(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String): Unit =
    writeParts(docs, idCol, textCol, dir, readPlan(spark, s"$dir/plan.txt"),
      overwrite = false)

  private def writeParts(docs: DataFrame, idCol: String, textCol: String,
      dir: String, plan: Dedup.MinhashPlan, overwrite: Boolean): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    // materialize the source once: the two writes below are separate jobs,
    // and reading `docs` twice would both double the corpus scan and let a
    // non-deterministic input (samples, limits) produce band rows whose
    // shingle rows don't exist
    val base = docs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // shingles FIRST (see append's crash semantics)
      base.select(col("id"), gf.shingle_hashes(col("text"), plan.shingleN).as("sh"))
        .write.mode(mode).parquet(s"$dir/shingles")
      base.select(
          explode(gf.lsh_bands(gf.minhash_sig(col("text"), plan.shingleN, plan.numHashes),
            plan.bands)).as("band"),
          col("id"))
        .write.mode(mode).parquet(s"$dir/bands")
    } finally base.unpersist()
  }

  /** Dedup a new batch against the index: returns (id_a, id_b, jaccard)
    * with id_a < id_b, covering new×stored AND new×new pairs at
    * jaccard >= tau — exactly the full-batch pairs that involve a new doc. */
  def queryNew(spark: SparkSession, dir: String, newDocs: DataFrame,
      idCol: String, textCol: String, tau: Double = 0.7,
      maxBandSize: Int = 0,
      broadcastVerify: Option[Boolean] = None,
      broadcastVerifyMaxBytes: Long = 128L << 20): DataFrame = {
    val plan = readPlan(spark, s"$dir/plan.txt")
    val docs = newDocs.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    val newBands0 = docs.select(col("id"),
      explode(gf.lsh_bands(gf.minhash_sig(col("text"), plan.shingleN, plan.numHashes),
        plan.bands)).as("band"))
    val stored = spark.read.schema(bandSchema).parquet(s"$dir/bands")
    // optional per-band candidate cap — the same bounded-work escape hatch
    // as Dedup.minhashLshPairs(maxBandSize): a degenerate bucket in the
    // STORED index (boilerplate-heavy corpus) multiplies every new doc
    // that hashes into it, so the cap counts over stored ∪ new and drops
    // the oversized bands from the new side (which gates both pair kinds)
    val newBands =
      if (maxBandSize <= 0) newBands0
      else {
        val bad = stored.select(col("band"))
          .unionByName(newBands0.select(col("band")))
          .groupBy("band").agg(count(lit(1)).as("band_n"))
          .where(col("band_n") > maxBandSize)
          .select(col("band"))
        newBands0.join(bad, Seq("band"), "left_anti")
      }
    // new×stored candidates: ids-only through the band join; new×new via
    // self-join — both normalized to (id_a < id_b) before the distinct
    val crossPairs = newBands.join(stored.withColumnRenamed("id", "old_id"), "band")
      .where(col("id") =!= col("old_id"))
      .select(least(col("id"), col("old_id")).as("id_a"),
        greatest(col("id"), col("old_id")).as("id_b"))
    val selfPairs = newBands.select(col("id").as("id_a"), col("band"))
      .join(newBands.select(col("id").as("id_b"), col("band")), Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val candidates = crossPairs.unionByName(selfPairs).distinct()
    val candidateIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id")))
      .distinct()
    // shingle arrays: new batch computes its own; stored participants are
    // RE-READ from the index (semi-joined down before anything widens).
    // A doc id present in BOTH (re-ingest) resolves DETERMINISTICALLY to
    // the new batch's row (max_by priority — `first` would pick whichever
    // row the shuffle delivered, varying run to run).
    val newSh = docs.select(col("id"),
      gf.shingle_hashes(col("text"), plan.shingleN).as("sh"), lit(1).as("pri"))
    val storedSh = spark.read.schema(shingleSchema).parquet(s"$dir/shingles")
      .withColumn("pri", lit(0))
    val participants = storedSh.unionByName(newSh)
      .join(candidateIds, Seq("id"), "left_semi")
    val lookup = participants
      .groupBy("id").agg(expr("max_by(sh, pri)").as("sh"))
    val aSide = lookup.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val bSide = lookup.select(col("id").as("id_b"), col("sh").as("sh_b"))
    // broadcast-vs-shuffle chosen from the MEASURED participant bytes, the
    // same estimator and standard as Dedup.minhashLshPairs. Measured on the
    // PRE-aggregate participants (a slight overestimate when re-ingested
    // ids exist): the probe re-runs only the ids-only candidate plan plus a
    // narrow semi-join, never the fat per-id aggregation
    val doBroadcast = broadcastVerify.getOrElse {
      Dedup.lookupBytes(participants, size(col("sh"))) <= broadcastVerifyMaxBytes
    }
    val (a, b) =
      if (doBroadcast) (broadcast(aSide), broadcast(bSide)) else (aSide, bSide)
    candidates.join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", gf.jaccard_sorted(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Idempotent once-per-(sf, tag, shingleN) build (the IvfIndex.ensure
    * pattern — the build parameter is part of the cached-index identity,
    * else a changed shingleN would silently serve the stale index). */
  def ensure(spark: SparkSession, sf: Double, tag: String, docs: => DataFrame,
      idCol: String, textCol: String, shingleN: Int = 0): String = {
    val dir = s"target/synth/sf$sf/minhash_idx_${tag}_s$shingleN"
    val marker = new Path(dir, "_BUILT")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def done = fs.exists(marker)
    if (!done) synchronized {
      if (!done) build(docs, idCol, textCol, dir, shingleN = shingleN)
    }
    dir
  }

  /**
   * CONTINUOUS dedup: a streaming source of documents is deduped
   * micro-batch by micro-batch against the index at rest, each batch's
   * near-dup pairs appended to `pairsOut`, and the batch itself appended
   * to the index so later batches dedup against it — streaming ingestion
   * with the same O(|batch| + candidates) shape as [[queryNew]].
   *
   * Failure semantics: foreachBatch may replay a batch after a crash.
   * Replayed appends are safe (duplicates collapse in the candidate
   * distinct / per-id aggregate — see [[append]]); replayed PAIR writes can
   * duplicate pair rows in `pairsOut`, so downstream consumers of the pair
   * log should read it with `.distinct()` (or consume the consolidated
   * groups, which are insensitive to duplicate edges). Exactly-once pair
   * output would need an idempotent sink keyed by batchId — out of scope
   * for the sandbox, noted for production.
   */
  def streamDedup(spark: SparkSession, dir: String, stream: DataFrame,
      idCol: String, textCol: String, pairsOut: String, tau: Double = 0.7,
      maxBandSize: Int = 0): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          queryNew(spark, dir, batch, idCol, textCol, tau, maxBandSize)
            .write.mode("append").parquet(pairsOut)
          append(spark, dir, batch, idCol, textCol)
        }
      }
      .start()

  // ------------------------------------------------------------- plan file

  private def writePlan(spark: SparkSession, path: String,
      plan: Dedup.MinhashPlan): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"${plan.shingleN},${plan.numHashes},${plan.bands}"
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def readPlan(spark: SparkSession, path: String): Dedup.MinhashPlan = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 4096, false)
      new String(bos.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val Array(s, n, b) = body.trim.split(",").map(_.toInt)
    Dedup.MinhashPlan(s, n, b)
  }
}
