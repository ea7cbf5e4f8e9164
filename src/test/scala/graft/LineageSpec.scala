package graft

import graft.operators.DocPipeline
import graft.plans.Lineage
import graft.sources.DocStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("resumable stage: second run skips done partitions; crash-resume completes the rest") {
    val p = DocStore.ensure(spark, 0.0005)
    val docs = DocStore.readDf(spark, p)
    val out = java.nio.file.Files.createTempDirectory("lineage").toString

    def stage(df: org.apache.spark.sql.DataFrame) =
      DocPipeline.geocodedSpans(df).select("doc_id", "region", "offset", "cell7")

    // simulate a partial run that completed only two regions before dying
    val partial = docs.where(col("region").isin("01", "02"))
    val first = Lineage.runResumable(spark, partial, out, "geocode")(stage)
    assert(first == Set("01", "02"))

    // resume over the full input: only the remaining regions are processed
    val second = Lineage.runResumable(spark, docs, out, "geocode")(stage)
    assert(!second.contains("01") && !second.contains("02"))
    assert(second.nonEmpty)

    // a third run is a no-op
    assert(Lineage.runResumable(spark, docs, out, "geocode")(stage).isEmpty)

    // the final store equals a from-scratch full run (no dup, no loss)
    val resumed = spark.read.parquet(s"$out/data")
    val direct = stage(docs)
    assert(resumed.count() == direct.count())
    assert(resumed.select("doc_id", "offset").except(direct.select("doc_id", "offset")).count() == 0)

    // lineage records per-partition rows + wall time for every region
    val prog = Lineage.progress(spark, out)
    val recorded = prog.select("region").distinct().count()
    assert(recorded == docs.select("region").distinct().count())
    assert(prog.where(col("rows") <= 0 || col("wallMs") < 0).count() == 0)
  }

  test("a second stage tracks independently on the same output root") {
    val p = DocStore.ensure(spark, 0.0005)
    val docs = DocStore.readDf(spark, p).where(col("region").isin("03", "04"))
    val out = java.nio.file.Files.createTempDirectory("lineage2").toString
    Lineage.runResumable(spark, docs, out, "stage_a")(df => df.select("doc_id", "region"))
    assert(Lineage.doneRegions(spark, out, "stage_a") == Set("03", "04"))
    assert(Lineage.doneRegions(spark, out, "stage_b").isEmpty)
  }
}
