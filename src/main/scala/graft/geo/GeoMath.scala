package graft.geo

object GeoMath {
  val EarthRadiusM = 6371000.0

  /** Great-circle distance in metres (haversine). */
  def haversineM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val p1 = math.toRadians(lat1)
    val p2 = math.toRadians(lat2)
    val dp = math.toRadians(lat2 - lat1)
    val dl = math.toRadians(lon2 - lon1)
    val a = math.sin(dp / 2) * math.sin(dp / 2) +
      math.cos(p1) * math.cos(p2) * math.sin(dl / 2) * math.sin(dl / 2)
    2.0 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /**
   * Squared Euclidean distance in degree space. Used as the kNN ranking metric
   * where a SQL oracle must reproduce the ordering bit-for-bit: only IEEE
   * exact-rounded ops (*, +, -), so Spark and DuckDB agree exactly.
   */
  @inline def dist2Deg(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dy = lat1 - lat2
    val dx = lon1 - lon2
    dy * dy + dx * dx
  }
}
