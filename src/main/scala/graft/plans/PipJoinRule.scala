package graft.plans

import graft.expr.{GridCellEncode, PointInPolygon, PolygonCellCover}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/**
 * Optimizer rule (SURVEY.md §4 "custom needed" (3)): a naive spatial theta-join
 *
 *   points JOIN polys ON st_contains(polys.rings, points.lat, points.lon)
 *
 * has no equi-keys, so Catalyst plans BroadcastNestedLoopJoin — O(points x
 * polys) PIP evaluations. This rule rewrites it into the two-phase shape the
 * engine uses explicitly in SpatialJoin.pipJoin:
 *
 *   points + grid_cell(lat, lon, res)
 *     JOIN (polys + explode(cell_cover(rings, res))) ON cell equality
 *     WHERE st_contains(rings, lat, lon)     -- exact residual
 *
 * which Catalyst then plans as a hash join with the PIP as a post-join filter.
 * Correctness: the cell cover is a superset of the polygon (bbox cover), so
 * the equi-join keeps every pair the residual could accept; the residual
 * itself is unchanged. Registered via SparkSessionExtensions (GraftExtensions).
 */
object PipJoinRule extends Rule[LogicalPlan] {

  private val CoverRes = 7

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(pip: PointInPolygon), hint)
        if pip.references.nonEmpty && comesFrom(pip.first, right) &&
          comesFrom(pip.second, left) && comesFrom(pip.third, left) =>
      rewrite(j, left, right, pip, hint)
    case j @ Join(left, right, Inner, Some(pip: PointInPolygon), hint)
        if pip.references.nonEmpty && comesFrom(pip.first, left) &&
          comesFrom(pip.second, right) && comesFrom(pip.third, right) =>
      // polys on the left: swap roles — INCLUDING the side hints, or a
      // broadcast hint meant for the small polygon relation would attach to
      // the points side of the rewritten join (broadcasting the big side)
      rewrite(j, right, left, pip, JoinHint(hint.rightHint, hint.leftHint))
  }

  private def comesFrom(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def rewrite(j: Join, pointsSide: LogicalPlan, polysSide: LogicalPlan,
      pip: PointInPolygon, hint: JoinHint): LogicalPlan = {
    val rings = pip.first
    val lat = pip.second
    val lon = pip.third

    // points + cell column
    val cellAttr = AttributeReference("__pip_cell", LongType, nullable = true)()
    val pointsWithCell = Project(
      pointsSide.output :+ Alias(GridCellEncode(lat, lon, Literal(CoverRes)), "__pip_cell")(cellAttr.exprId),
      pointsSide)

    // polys + exploded cover cell
    val coverAttr = AttributeReference("__pip_cover", LongType, nullable = true)()
    val exploded = Generate(
      Explode(PolygonCellCover(rings, Literal(CoverRes))),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(coverAttr),
      child = polysSide)

    val equi = EqualTo(cellAttr, coverAttr)
    val joined = Join(pointsWithCell, exploded,
      Inner, Some(And(equi, pip)), hint)
    // drop the helper columns, restoring the original output
    Project(j.output, joined)
  }
}

/** spark.sql.extensions entry point: optimizer rule + SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => PipJoinRule)
  }
}
