package graft.geo

/** Counter-based deterministic RNG (splitmix64) — pure function of the seed,
  * so data generation is reproducible across runs, partitions and cluster
  * sizes (required for the N vs 4N scaling comparison). */
object Rng {
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Uniform double in [0, 1). */
  def uniform(seed: Long): Double =
    (splitmix64(seed) >>> 11).toDouble / (1L << 53).toDouble

  /** Uniform int in [0, n). */
  def uniformInt(seed: Long, n: Int): Int =
    ((splitmix64(seed) >>> 1) % n).toInt
}
