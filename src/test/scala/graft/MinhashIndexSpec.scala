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
