package graft

import graft.operators.{Dedup, MinhashIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental dedup against the persisted minhash index. */
class MinhashIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(ids: Seq[Long]) = {
    val base = "the quick brown fox jumps over the lazy dog and keeps running onward"
    ids.map { i =>
      val text =
        if (i % 10 == 1) base // clones of each other across batches
        else if (i % 10 == 2) base.replace("dog", "cat")
        else s"unique document number $i with its own content ${i * 7919}"
      (i, text)
    }.toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("queryNew == full-batch minhash pairs restricted to pairs involving a new doc") {
    val old = corpus(1L to 40L)
    val fresh = corpus(41L to 60L)
    val dir = java.nio.file.Files.createTempDirectory("mh_idx").toString
    val plan = MinhashIndex.build(old, "doc_id", "text", dir)
    assert(MinhashIndex.readPlan(spark, s"$dir/plan.txt") == plan)

    val incr = pairSet(MinhashIndex.queryNew(spark, dir, fresh, "doc_id", "text", tau = 0.5))
    val full = pairSet(Dedup.minhashLshPairs(old.unionByName(fresh), "doc_id", "text",
        shingleN = plan.shingleN, numHashes = plan.numHashes, bands = plan.bands, tau = 0.5)
      .where(col("id_a") > 40 || col("id_b") > 40))
    assert(incr == full, s"incr-only=${incr -- full} full-only=${full -- incr}")
    // cross-batch clones found (41/51 vs the old 1/11/21/31 clones)
    assert(incr.contains((1L, 41L)) && incr.contains((41L, 51L)))
    // old×old pairs never re-emitted
    assert(incr.forall { case (a, b) => a > 40 || b > 40 })
  }

  test("re-ingested id resolves to the NEW batch's text, deterministically") {
    val old = corpus(1L to 20L)
    val dir = java.nio.file.Files.createTempDirectory("mh_idx3").toString
    MinhashIndex.build(old, "doc_id", "text", dir)
    // id 5 reappears with text cloned from old doc 1: if verification used
    // the stored (unique) text for 5, the (1,5) pair would fail the exact
    // bar; the new row must win
    val reingest = corpus(Seq(5L)).withColumn("text",
      lit("the quick brown fox jumps over the lazy dog and keeps running onward"))
    val got = pairSet(MinhashIndex.queryNew(spark, dir, reingest, "doc_id", "text", tau = 0.9))
    assert(got.contains((1L, 5L)), got.toString)
    val again = pairSet(MinhashIndex.queryNew(spark, dir, reingest, "doc_id", "text", tau = 0.9))
    assert(got == again)
  }

  test("maxBandSize caps degenerate stored buckets in the incremental path") {
    // 30 identical stored docs = every band a degenerate 30-doc bucket; a
    // new clone of them would otherwise emit 30 cross pairs
    val boiler = (1L to 30L).map(i => (i, "exact same boilerplate text in every document here"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("mh_idx4").toString
    MinhashIndex.build(boiler, "doc_id", "text", dir)
    val fresh = Seq((99L, "exact same boilerplate text in every document here")).toDF("doc_id", "text")
    assert(MinhashIndex.queryNew(spark, dir, fresh, "doc_id", "text", tau = 0.9).count() == 30)
    assert(MinhashIndex.queryNew(spark, dir, fresh, "doc_id", "text", tau = 0.9,
      maxBandSize = 10).count() == 0)
  }

  test("streamDedup: micro-batches dedup against the index AND each other; pair log == batch-equivalent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val old = corpus(1L to 40L)
    val dir = java.nio.file.Files.createTempDirectory("mh_idx_s").toString
    val pairsOut = java.nio.file.Files.createTempDirectory("mh_pairs").toString + "/log"
    MinhashIndex.build(old, "doc_id", "text", dir)

    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = MinhashIndex.streamDedup(spark, dir, stream, "doc_id", "text", pairsOut, tau = 0.5)
    try {
      // batch 1: clone of old doc 1; batch 2: clone of batch 1's clone
      input.addData((41L, corpus(Seq(41L)).collect()(0).getString(1)))
      q.processAllAvailable()
      input.addData((51L, corpus(Seq(51L)).collect()(0).getString(1)))
      q.processAllAvailable()
    } finally q.stop()

    val logged = spark.read.parquet(pairsOut).select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 41 paired against the prebuilt index's clones (1, 11, 21, 31); 51
    // paired against those AND the already-ingested 41 — the cross-batch
    // edge proves the index grew between micro-batches
    assert(logged.contains((1L, 41L)) && logged.contains((41L, 51L)), logged.toString)
    // the streamed pair log equals the full-batch operator restricted to
    // pairs involving a streamed doc
    val plan = MinhashIndex.readPlan(spark, s"$dir/plan.txt")
    val full = pairSet(Dedup.minhashLshPairs(
        old.unionByName(corpus(Seq(41L, 51L))), "doc_id", "text",
        shingleN = plan.shingleN, numHashes = plan.numHashes, bands = plan.bands, tau = 0.5)
      .where(col("id_a") > 40 || col("id_b") > 40))
    assert(logged == full, s"logged-only=${logged -- full} full-only=${full -- logged}")
  }

  test("append grows the index: a later batch dedups against both earlier ones") {
    val old = corpus(1L to 40L)
    val second = corpus(41L to 60L)
    val third = corpus(61L to 80L)
    val dir = java.nio.file.Files.createTempDirectory("mh_idx2").toString
    MinhashIndex.build(old, "doc_id", "text", dir)
    MinhashIndex.append(spark, dir, second, "doc_id", "text")
    val incr = pairSet(MinhashIndex.queryNew(spark, dir, third, "doc_id", "text", tau = 0.5))
    // third-batch clone 61 must pair with clones from BOTH earlier batches
    assert(incr.contains((1L, 61L)) && incr.contains((41L, 61L)))
    assert(incr.forall { case (a, b) => a > 60 || b > 60 })
  }
}
