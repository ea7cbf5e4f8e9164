package graft.operators

import graft.expr.gf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deduplication suite for large-scale training-data pipelines: exact,
 * MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
 *
 * Scale shape: every variant is candidate-generation-by-equi-join (hash
 * shuffle on band/bucket keys — never an all-pairs cross join) followed by an
 * exact verification predicate on the candidate pairs. Band keys make hot
 * buckets shuffle-parallel; pairs are emitted once (id_a < id_b).
 */
object Dedup {

  /** Exact dedup: one winner (min id) per identical text; adds dup_count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Exact-dedup filter: the surviving rows themselves. */
  def exactRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.join(exact(df, idCol, textCol).select(col("keep_id").as(idCol)), idCol)

  /** Join the candidate pairs back to a per-side lookup table.
    *
    * Default: EXPLICIT broadcast. The lookup (candidate participants only)
    * sits behind a broadcast semi-join with NO shuffle boundary, so Catalyst
    * has no runtime stats for it: the estimate falls back to the full
    * corpus, the join plans as SortMergeJoin, and AQE coalesces the id-only
    * pair shuffle to ~1 partition while post-join rows balloon by the
    * payload width (72 s vs 4.5 s measured at the 100k-doc soak). The
    * broadcast is also strictly better than ANY shuffle plan when it fits:
    * both fat joins become map-side, so the (pairs x payload) intermediate
    * streams through whole-stage codegen and never hits shuffle files
    * (an AQE-visible exchange variant measured 170 s — the intermediate
    * shuffles twice).
    *
    * `broadcastVerify = false` is the escape hatch when the participant set
    * itself is beyond broadcast (high-ambient-similarity corpora — an
    * unconditional broadcast OOMed at the 300k-doc soak until the BANDING
    * was scaled): pairs spread across the full shuffle width before the fat
    * joins. The first-order fix at scale is always fewer junk candidates —
    * more hashes per band (see Similarity.lshPlan) and/or maxBandSize. */
  private def verifyJoin(candidates: DataFrame, lookup: DataFrame,
      broadcastVerify: Boolean): DataFrame = {
    val aSide = lookup.toDF(lookup.columns.map(c => s"${c}_a"): _*)
    val bSide = lookup.toDF(lookup.columns.map(c => s"${c}_b"): _*)
    if (broadcastVerify)
      candidates.join(broadcast(aSide), "id_a").join(broadcast(bSide), "id_b")
    else {
      val n = candidates.sparkSession.sessionState.conf.numShufflePartitions
      candidates.repartition(n, col("id_a")).join(aSide, "id_a").join(bSide, "id_b")
    }
  }


  /**
   * MinHash + LSH near-dup pairs: shingle -> minhash signature -> band keys ->
   * bucket equi-join -> exact Jaccard verification >= tau.
   *
   * Shuffle shape (the 100 TB property): ONLY (id, band) rides the band
   * shuffle and only (id_a, id_b) rides the pair-distinct — document texts
   * never enter a wide shuffle. Texts are re-joined once per *unique* pair
   * for the exact verification (two narrow hash joins on id). Previously the
   * full payloads travelled through both the band join and the distinct; at
   * sf0.1 that one query was 40% of the whole bench.
   *
   * @param maxBandSize optional candidate cap: bands holding more than this
   *   many docs are dropped from candidate generation (degenerate buckets —
   *   e.g. a corpus of near-identical boilerplate — are inherently quadratic
   *   in pair count; capping trades recall on exactly those buckets for
   *   bounded work, the standard LSH-at-scale practice). 0 = unlimited
   *   (exact LSH semantics; the spec-pinned default).
   */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
      tau: Double = 0.7, maxBandSize: Int = 0,
      broadcastVerify: Boolean = true): DataFrame = {
    val docs = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val sig = docs
      .select(col("id"),
        explode(gf.lsh_bands(gf.minhash_sig(col("text"), shingleN, numHashes), bands)).as("band"))
    val capped =
      if (maxBandSize <= 0) sig
      else {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("band")
        sig.withColumn("band_n", count(lit(1)).over(w))
          .where(col("band_n") <= maxBandSize)
          .drop("band_n")
      }
    val candidates = capped.select(col("id").as("id_a"), col("band"))
      .join(capped.select(col("id").as("id_b"), col("band")), Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // verification re-join, corpus-scale shape: first semi-join the corpus
    // down to only docs that appear in ANY candidate pair (candidate ids are
    // tiny next to the corpus -> AQE broadcasts the semi side; full texts are
    // never shuffled). Shingle sets are computed ONCE PER DOC as sorted hash
    // arrays — pair-level Jaccard is then an allocation-free merge-count
    // (building two shingle SETS per pair made a 180k-pair degenerate
    // boilerplate cluster cost 130 s at the 100k-doc soak; per-doc hashing
    // is the per-pair-O(|shingles|) shape that survives quadratic cliques).
    val candidateIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id")))
      .distinct()
    val needed = docs.join(candidateIds, Seq("id"), "left_semi")
      .select(col("id"), gf.shingle_hashes(col("text"), shingleN).as("sh"))
    verifyJoin(candidates, needed, broadcastVerify)
      .withColumn("jaccard", gf.jaccard_sorted(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * SimHash near-dup pairs: 64-bit simhash split into 16-bit bands; any pair
   * within Hamming distance <= 3 of each other shares at least one exact band
   * (pigeonhole over 4 bands), so the band join loses nothing at maxHamming<=3.
   *
   * Unlike minhash/embedding, the 8-byte signature DELIBERATELY rides the
   * band shuffle: re-joining it per pair (two extra joins) would cost more
   * than shuffling one long per row — the ids-only re-join discipline pays
   * off only when the payload is wider than the join machinery it saves.
   */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16-bit banding certifies recall only to hamming 3")
    val sh = df.select(col(idCol).as("id"), gf.simhash64(col(textCol)).as("sh"))
    val banded = sh.withColumn("band",
      explode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xFFFFL)) + lit(b.toLong << 32)): _*)))
    val a = banded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("band"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("band"))
    a.join(b, Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .distinct()
      .withColumn("hamming", gf.hamming64(col("sh_a"), col("sh_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /**
   * Exact n-gram Jaccard pairs via shingle inverted index (no approximation):
   * explode distinct shingles, equi-join on shingle, count common, Jaccard
   * from inclusion-exclusion. SQL-oracle-expressible (pure substring math).
   */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.5): DataFrame = {
    val sh2 = df
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .where(length(col("text")) >= n)
      .selectExpr("id", "text",
        s"explode(array_distinct(transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n)))) AS sh")
    val counts = sh2.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh2.select(col("id").as("id_a"), col("sh"))
      .join(sh2.select(col("id").as("id_b"), col("sh")), Seq("sh"))
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
    pairs
      .join(counts.select(col("id").as("id_a"), col("n_sh").as("n_a")), "id_a")
      .join(counts.select(col("id").as("id_b"), col("n_sh").as("n_b")), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")).cast("double"))
      .where(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("common"), col("n_a"), col("n_b"))
  }

  /**
   * Embedding-cosine near-dup pairs: hyperplane-LSH bucket join (candidate
   * generation) + exact quantised-cosine verification.
   */
  def embeddingPairs(df: DataFrame, idCol: String, vecCol: String,
      minCos: Double = 0.95, bits: Int = 16, bands: Int = 4,
      broadcastVerify: Boolean = true): DataFrame = {
    // same shuffle discipline as minhashLshPairs: ids-only through the band
    // join and the pair-distinct; quantized vectors re-joined once per unique
    // pair for the exact verification
    val vecs = df.select(col(idCol).as("id"), gf.vec_quantize(col(vecCol)).as("q"))
    val sig = df.select(col(idCol).as("id"),
      explode(gf.sig_bands(gf.vec_sig(col(vecCol), bits), bits, bands)).as("band"))
    val candidates = sig.select(col("id").as("id_a"), col("band"))
      .join(sig.select(col("id").as("id_b"), col("band")), Seq("band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    // same corpus-scale verification shape as minhashLshPairs: semi-join the
    // vectors down to candidate participants before the per-side joins
    val candidateIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id")))
      .distinct()
    val needed = vecs.join(candidateIds, Seq("id"), "left_semi")
    verifyJoin(candidates, needed, broadcastVerify)
      .withColumn("cos", gf.vec_cos_q(col("q_a"), col("q_b")))
      .where(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
