package graft

import graft.expr.gf
import graft.plans.PipJoinRule
import graft.synth.DataGen
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipJoinRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ensureRule(): Unit =
    if (!spark.experimental.extraOptimizations.contains(PipJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PipJoinRule

  test("naive st_contains theta-join gets rewritten to cell equi-join + residual") {
    ensureRule()
    val points = (0 until 2000).map { i =>
      (s"p$i", 40.0 + 30.0 * graft.geo.Rng.uniform(2 * i),
        30.0 + 50.0 * graft.geo.Rng.uniform(2 * i + 1))
    }.toDF("pid", "lat", "lon")
    val polys = DataGen.regionPolys(spark).toDF().select($"poly_id", $"rings")

    val naive = points.join(polys, gf.st_contains(polys("rings"), points("lat"), points("lon")))
    val plan = naive.queryExecution.executedPlan.toString

    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"rule did not fire — BNLJ still in plan:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected an equi-join in plan:\n$plan")

    // correctness: identical to ground truth (brute-force PIP per pair)
    val got = naive.select($"pid", $"poly_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val pts = points.collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val polyRows = polys.collect().map { r =>
      val rings = r.getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toArray
      (r.getString(0), rings)
    }
    val want = (for {
      (pid, lat, lon) <- pts
      (polyId, rings) <- polyRows
      if graft.geo.Pip.contains(rings, lon, lat)
    } yield (pid, polyId)).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("rule fires with sides flipped (polys on the left)") {
    ensureRule()
    val points = Seq(("p0", 52.5, 32.5), ("p1", -10.0, -10.0)).toDF("pid", "lat", "lon")
    val polys = DataGen.regionPolys(spark).toDF().select($"poly_id", $"rings")
    val flipped = polys.join(points, gf.st_contains(polys("rings"), points("lat"), points("lon")))
    val plan = flipped.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // p0 is inside the 10x6 region grid area, p1 far outside every polygon
    val got = flipped.select("pid").distinct().collect().map(_.getString(0)).toSet
    assert(!got.contains("p1"))
  }
}
