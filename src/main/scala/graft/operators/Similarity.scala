package graft.operators

import graft.expr.gf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (array<float>).
 *
 * - `bruteTopK`: exact cosine top-k — the baseline and the oracle path
 *   (quantised integer math so a SQL oracle reproduces scores bit-for-bit).
 * - `annTopK`: hyperplane-LSH bucketed candidates + exact re-rank — the scale
 *   path. Recall measured against brute force in the test suite.
 *
 * Scale shape: brute force broadcasts the smaller side; ANN shuffles on
 * band keys only (candidates ~ corpus/2^bandBits per band), so the pair count
 * stays near-linear instead of quadratic.
 */
object Similarity {

  /** Exact top-k by quantised cosine. queries: (qid, vec); corpus: (tid, vec). */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      broadcastCorpus: Boolean = true): DataFrame = {
    val q = queries.select(col("qid"), gf.vec_quantize(col("vec")).as("q_q"))
    val c = corpus.select(col("tid"), gf.vec_quantize(col("vec")).as("q_t"))
    val cSide = if (broadcastCorpus) broadcast(c) else c
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("tid"))
    q.crossJoin(cSide)
      .withColumn("cos", gf.vec_cos_q(col("q_q"), col("q_t")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("tid"), col("cos"), col("rn"))
  }

  /** Approximate top-k: LSH band candidates, exact re-rank, top-k.
    * Missing neighbours (no shared band) are the recall loss. */
  def annTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      bits: Int = 16, bands: Int = 8): DataFrame = {
    val q = queries
      .select(col("qid"), col("vec"))
      .withColumn("q_q", gf.vec_quantize(col("vec")))
      .withColumn("band", explode(gf.sig_bands(gf.vec_sig(col("vec"), bits), bits, bands)))
      .drop("vec")
    val c = corpus
      .select(col("tid"), col("vec"))
      .withColumn("q_t", gf.vec_quantize(col("vec")))
      .withColumn("band", explode(gf.sig_bands(gf.vec_sig(col("vec"), bits), bits, bands)))
      .drop("vec")
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("tid"))
    q.join(c, Seq("band"))
      .select(col("qid"), col("tid"), col("q_q"), col("q_t"))
      .distinct()
      .withColumn("cos", gf.vec_cos_q(col("q_q"), col("q_t")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("tid"), col("cos"), col("rn"))
  }

  /** Recall of `got` vs exact `want` on (qid, tid) pairs. */
  def recall(got: DataFrame, want: DataFrame): Double = {
    val g = got.select("qid", "tid")
    val w = want.select("qid", "tid")
    val hit = w.join(g, Seq("qid", "tid"), "left_semi").count()
    val total = w.count()
    if (total == 0) 1.0 else hit.toDouble / total
  }
}
