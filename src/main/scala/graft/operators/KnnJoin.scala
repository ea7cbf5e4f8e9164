package graft.operators

import graft.expr.gf
import graft.geo.GridCell
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/**
 * k-nearest-neighbour join via grid-cell k-ring expansion (SURVEY.md §2.2
 * Joins (c)), with a per-query correctness certificate.
 *
 * Candidate generation: each query point's cell is expanded to its K-ring;
 * candidates come from an equi-join on cell. A query's top-k is *certified*
 * when >= k candidates were found AND the k-th distance is strictly inside the
 * ring's guaranteed coverage radius (any point outside the K-ring is at least
 * K*minCellDim degrees away — GridCell.safeRadiusDeg). Uncertified queries
 * escalate to a wider ring, then to a brute-force join — so results are
 * *exactly* the true top-k (matching the brute-force SQL oracle row for row),
 * while the scale path touches only nearby cells.
 *
 * Ranking metric: squared degree-space distance (dist2_deg) — IEEE-exact
 * arithmetic, so the DuckDB oracle reproduces the ordering bit-for-bit.
 * Ties break on target id for full determinism.
 */
object KnnJoin {

  /**
   * @param queries (qid, lat, lon)
   * @param targets (tid, lat, lon)
   * @param k       neighbours per query
   * @param res     grid resolution for candidate cells
   * @param ringSteps escalation schedule of K-ring radii
   * @return (qid, tid, dist2, rn) — exact top-k per query, rn in 1..k
   */
  def knnJoin(queries: DataFrame, targets: DataFrame, k: Int, res: Int = 8,
      ringSteps: Seq[Int] = Seq(1, 4), broadcastTargets: Boolean = false): DataFrame = {

    val t = targets.select(
      col("tid"), col("lat").as("t_lat"), col("lon").as("t_lon"),
      gf.grid_cell(col("lat"), col("lon"), res).as("cell"))
    val tSide = if (broadcastTargets) broadcast(t) else t

    val w = Window.partitionBy("qid").orderBy(col("dist2"), col("tid"))

    def rankCandidates(cand: DataFrame): DataFrame =
      cand
        .withColumn("dist2", gf.dist2_deg(col("lat"), col("lon"), col("t_lat"), col("t_lon")))
        .withColumn("rn", row_number().over(w))

    var remaining = queries.select("qid", "lat", "lon")
    var resultParts = List.empty[DataFrame]

    for (ringK <- ringSteps) {
      val safe2 = {
        val s = ringK * SpatialJoin.minCellDimDeg(res)
        s * s
      }
      val cand = remaining
        .withColumn("cell", explode(gf.grid_kring(gf.grid_cell(col("lat"), col("lon"), res), ringK)))
        .join(tSide, "cell")
      val ranked = rankCandidates(cand)
      // certificate: k-th neighbour strictly inside guaranteed coverage
      val cert = ranked.where(col("rn") <= k)
        .groupBy("qid")
        .agg(count(lit(1)).as("cnt"), max(col("dist2")).as("kth"))
        .where(col("cnt") === k && col("kth") < safe2)
        .select(col("qid"))
      resultParts ::= ranked.where(col("rn") <= k)
        .join(cert, "qid")
        .select(col("qid"), col("tid"), col("dist2"), col("rn"))
      remaining = remaining.join(cert, Seq("qid"), "left_anti")
    }

    // exact fallback for the stragglers (sparse neighbourhoods): brute force
    val brute = rankCandidates(remaining.crossJoin(tSide.drop("cell")))
      .where(col("rn") <= k)
      .select(col("qid"), col("tid"), col("dist2"), col("rn"))

    (brute :: resultParts).reduce(_.unionByName(_))
  }

  /** Plain brute-force kNN (the oracle path; also right for tiny target sets). */
  def knnBrute(queries: DataFrame, targets: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(col("dist2"), col("tid"))
    queries.select("qid", "lat", "lon")
      .crossJoin(broadcast(targets.select(
        col("tid"), col("lat").as("t_lat"), col("lon").as("t_lon"))))
      .withColumn("dist2", gf.dist2_deg(col("lat"), col("lon"), col("t_lat"), col("t_lon")))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("tid"), col("dist2"), col("rn"))
  }
}
