package graft

import graft.operators.{DocPipeline, SpatialJoin}
import graft.sources.DocStore
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates: the properties that matter at 100 TB must be
  * visible in the plan, not just assumed — filter pushdown reaching the scan,
  * partition pruning, broadcast (never nested-loop) spatial joins, column
  * pruning, and whole-stage codegen over the hot expressions. */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docsPath = DocStore.ensure(spark, 0.0005)

  test("parquet scan gets predicate pushdown and column pruning") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .where($"l_quantity" > 30.0)
      .select($"l_orderkey", $"l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("doc store read prunes partitions by region") {
    val df = DocStore.readDf(spark, docsPath, Seq("77"))
    val plan = df.queryExecution.executedPlan.toString
    // the physical scan's partition filter carries the region predicate
    // (inputFiles is pre-pruning metadata, so the plan is the real check;
    // pruned RESULTS are asserted in DataGenSpec)
    assert(plan.contains("PartitionFilters: [isnotnull(region"), plan)
    assert(plan.contains("(region#") && plan.contains("= 77)"), plan)
  }

  test("flagship spatial join is a broadcast hash join, never a nested loop") {
    val plan = DocPipeline.regionDocCounts(
      DocStore.readDf(spark, docsPath), DataGen.regionPolys(spark).toDF())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("flagship scan reads only the needed columns") {
    val anchors = DocPipeline.docAnchors(DocStore.readDf(spark, docsPath))
      .select("doc_id", "lat", "lon")
    val plan = anchors.queryExecution.executedPlan.toString
    // spans + doc_id are required; other stored fields must be pruned away
    assert(plan.contains("ReadSchema: struct<doc_id:string,spans:"), plan)
  }

  test("aggregation plans use partial (map-side) aggregation") {
    val plan = DocStore.readDf(spark, docsPath)
      .groupBy("region").count()
      .queryExecution.executedPlan.toString
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("hot expression pipeline stays inside whole-stage codegen") {
    val plan = DocPipeline.docAnchors(DocStore.readDf(spark, docsPath))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan) // fused stage marker
  }
}
