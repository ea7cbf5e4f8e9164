package graft

import graft.geo.Rng
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * sf1.0-scale soak for the dedup / ANN pipelines (BENCH.md appendix): the
 * sf0.1 bench runs these on 100-5k-row samples; this main runs them on a
 * 100k-document / 100k-vector corpus with planted near-dup structure —
 * including one 600-document boilerplate cluster, so the candidate-pair
 * stream through the ids-only band join + pair-distinct is ~200k pairs (the
 * regime where the round-1 payload-through-shuffle shape collapsed) — and
 * reports one JSON line of per-operator seconds.
 *
 * Everything is derived from counter-based RNG (no wall clock): identical
 * corpus on every run, so timings across rounds are comparable.
 *
 *   sbt 'runMain graft.ScaleSoak'            # local[32], the default
 *   SPARK_GRAFT_CPUS=8 sbt 'runMain graft.ScaleSoak'
 */
object ScaleSoak {

  private val Vocab: IndexedSeq[String] =
    (0 until 2048).map(i => f"w${Rng.splitmix64(0xB0CAB000L + i) & 0xFFFFFFL}%x")

  /** ~40-word deterministic text; every 50th pair (i, i+1) is a near-dup
    * (one word changed); ids in [boilStart, boilStart+600) share one
    * boilerplate template with a single varying word (the hot LSH bucket). */
  private def docText(i: Long, boilStart: Long, boilN: Int): String = {
    val boiler = i >= boilStart && i < boilStart + boilN
    val base = if (boiler) 0x1337L else if (i % 50 == 1) (i - 1) * 7919L else i * 7919L
    val words = (0 until 40).map { j =>
      if (boiler && j == 20) Vocab((Rng.splitmix64(i * 31L + j) & 0x7FF).toInt)
      else if (!boiler && i % 50 == 1 && j == 7) "changed"
      else Vocab((Rng.splitmix64(base + j) & 0x7FF).toInt)
    }
    words.mkString(" ")
  }

  /** Vector near one of 256 centers, with within-cluster cosine ~0.6-0.8
    * (clustered like real corpora but NOT a near-dup clique — pair counts
    * must come from the planted dups, not accidental cluster cliques).
    * Every 100th vector is a true near-dup of its predecessor (cos > 0.99). */
  private def vec(i: Long, dim: Int): Array[Float] = {
    val base = if (i % 100 == 7) i - 1 else i
    val c = (base % 256).toInt
    Array.tabulate(dim) { d =>
      val center = ((Rng.splitmix64(0xCE17E500L + c * 64L + d) >>> 11).toFloat / (1L << 53).toFloat) - 0.5f
      val noise = ((Rng.splitmix64(base * 131L + d) >>> 11).toFloat / (1L << 53).toFloat - 0.5f) * 0.7f
      val jitter = if (i % 100 == 7)
        ((Rng.splitmix64(i * 977L + d) >>> 11).toFloat / (1L << 53).toFloat - 0.5f) * 0.02f
      else 0f
      center + noise + jitter
    }
  }

  def documents(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 64).map(i => (i, docText(i, n / 2, 600)))
      .toDF("doc_id", "text")
  }

  def embeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, 64).map(i => (i, vec(i, dim))).toDF("vec_id", "embedding")
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SOAK_DOCS", "100000").toLong
    val nVecs = sys.env.getOrElse("SOAK_VECS", "100000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // materialise inputs once: soak timings measure the OPERATORS
    val docs = documents(spark, nDocs).cache(); docs.count()
    val emb = embeddings(spark, nVecs).cache(); emb.count()
    val queries = emb.where(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("vec")).cache()
    queries.count()
    val corpus = emb.select(col("vec_id").as("tid"), col("embedding").as("vec"))

    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val stats = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def timed(name: String)(f: => Long): Unit = {
      System.err.println(s"SOAK start $name")
      val t0 = System.nanoTime()
      stats(name) = f
      times(name) = (System.nanoTime() - t0) / 1e9
      System.err.println(f"SOAK done  $name ${times(name)}%.1f s rows=${stats(name)}")
    }

    timed("dedup_exact_full") {
      graft.operators.Dedup.exact(docs, "doc_id", "text").count()
    }
    // shingle width scales with the corpus: character 3-grams of same-
    // alphabet text share a large ambient Jaccard (frequent trigrams), so at
    // 100k+ docs random pairs start colliding in 4-hash bands and the
    // candidate PARTICIPANT set balloons toward the corpus — the production
    // cure is wider shingles (5-grams), which collapses ambient similarity
    // while true near-dups (one word changed) stay >> tau
    val shingleN = if (nDocs > 150000) 5 else 3
    timed("minhash_lsh_full") {
      graft.operators.Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = shingleN, tau = 0.5).count()
    }
    timed("simhash_full") {
      graft.operators.Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).count()
    }
    // LSH banding scales with the corpus: bits-per-band ~ log2(N), else a
    // band key matches a constant FRACTION of all pairs (4-bit default bands
    // collide on ~6% of 5e9 pairs at 100k vectors -> ~1e9 candidates; 16-bit
    // bands collide on ~1.5e-5 of them). The bits/bands knobs exist for
    // exactly this; small-scale defaults are pinned by the specs.
    val (pBits, pBands) = graft.operators.Similarity.lshPlan(nVecs, bands = 4)
    timed("embedding_pairs_full") {
      graft.operators.Dedup.embeddingPairs(emb, "vec_id", "embedding",
        minCos = 0.95, bits = pBits, bands = pBands).count()
    }
    val (aBits, aBands) = graft.operators.Similarity.lshPlan(nVecs, bands = 8)
    timed("ann_topk") {
      graft.operators.Similarity.annTopK(queries, corpus, k = 10,
        bits = aBits, bands = aBands).count()
    }
    timed("ivf_topk_kmeans1") {
      graft.operators.Similarity.ivfTopK(queries, corpus, k = 10,
        kCentroids = 64, nProbe = 8, kmeansIters = 1).count()
    }

    val ts = times.map { case (k, v) => "\"" + k + f"\":$v%.2f" }.mkString("{", ",", "}")
    val ss = stats.map { case (k, v) => "\"" + k + s"\":$v" }.mkString("{", ",", "}")
    println(s"""{"soak":"sf1.0","cpus":$cpus,"n_docs":$nDocs,"n_vecs":$nVecs,"sec":$ts,"rows":$ss}""")
    spark.stop()
  }
}
