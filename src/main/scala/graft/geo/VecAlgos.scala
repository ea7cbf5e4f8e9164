package graft.geo

/**
 * Embedding vector primitives for similarity search / near-dup detection.
 *
 * Quantized variants (`floor(x * 1000)` int64 math) exist for oracle parity:
 * the SQL oracle reproduces them bit-for-bit, and cosine built from exact
 * integers via one division + sqrt is IEEE-exact across engines.
 */
object VecAlgos {
  val QuantScale = 1000.0

  def quantize(v: Array[Float]): Array[Long] = {
    val out = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { out(i) = math.floor(v(i).toDouble * QuantScale).toLong; i += 1 }
    out
  }

  def dotQ(a: Array[Long], b: Array[Long]): Long = {
    var s = 0L
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  def normQ(a: Array[Long]): Long = dotQ(a, a)

  /** Exact-parity cosine from quantized ints: one division + one sqrt. */
  def cosineQ(a: Array[Long], b: Array[Long]): Double = {
    val na = normQ(a); val nb = normQ(b)
    if (na == 0L || nb == 0L) 0.0
    else dotQ(a, b).toDouble / math.sqrt(na.toDouble * nb.toDouble)
  }

  def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val d = dot(a, b)
    val na = dot(a, a); val nb = dot(b, b)
    if (na == 0.0 || nb == 0.0) 0.0 else d / math.sqrt(na * nb)
  }

  /** Random-hyperplane LSH signature: bit j = sign of <v, h_j> where h_j is a
    * deterministic splitmix-seeded Rademacher hyperplane. Cosine-similar
    * vectors collide in most bits. */
  def hyperplaneSig(v: Array[Float], bits: Int, seed: Long = 0x51A7L): Long = {
    var sig = 0L
    var j = 0
    while (j < bits) {
      var s = 0.0
      var i = 0
      while (i < v.length) {
        // Rademacher +-1 component, pure function of (seed, j, i)
        val r = if ((Rng.splitmix64(seed + j * 10007L + i) & 1L) == 0L) 1.0 else -1.0
        s += r * v(i)
        i += 1
      }
      if (s >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  /** Split a signature into `bands` contiguous bit-bands (band values). */
  def sigBands(sig: Long, bits: Int, bands: Int): Array[Long] = {
    // bits < bands would truncate width to 0 -> mask 0 -> every signature
    // emits the SAME constant band keys = silent all-pairs cross join
    // (the minhash sibling lshBands guards its equivalent)
    require(bands >= 1 && bits >= bands,
      s"bits $bits must be >= bands $bands (>= 1)")
    val width = bits / bands
    // JVM shifts are mod-64: (1L << 64) - 1 wraps to 0 and every signature
    // would collapse into band value 0 (an all-pairs cross join)
    val mask = if (width >= 64) -1L else (1L << width) - 1
    Array.tabulate(bands)(b => ((sig >>> (b * width)) & mask) | (b.toLong << 32))
  }
}
