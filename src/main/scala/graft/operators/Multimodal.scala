package graft.operators

import graft.geo.Rng
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/**
 * Multimodal column handling: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed in batch-shaped per-partition
 * operators (the Scala analog of `mapInPandas` batches).
 *
 * The codec step is STUBBED (no image/audio libraries ship in this sandbox):
 * `decodeStub` parses a deterministic fake header instead of invoking a real
 * decoder — the Spark-side plumbing (schema, binary transport, partitioning,
 * batch iteration, output shape) is real and tested. Swap `decodeStub`'s body
 * for an actual codec (e.g. javax.imageio / ffmpeg bindings) in production.
 */
object Multimodal {

  /** media payload header: [kind: 1 byte][width: 4][height: 4][frames: 4] then
    * pseudo-random body bytes — the deterministic fake a real decoder stands
    * in for. */
  def makePayload(kind: String, width: Int, height: Int, frames: Int, seed: Long, bodyLen: Int): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(13 + bodyLen)
    buf.put((kind match { case "image" => 1; case "audio" => 2; case "video" => 3; case _ => 0 }).toByte)
    buf.putInt(width); buf.putInt(height); buf.putInt(frames)
    var i = 0
    var s = seed
    while (i < bodyLen) { s = Rng.splitmix64(s); buf.put((s & 0xFF).toByte); i += 1 }
    buf.array()
  }

  case class Decoded(kind: String, width: Int, height: Int, frames: Int, bodyLen: Int)

  /** ??? in production — a real image/audio decoder goes here. The stub reads
    * the deterministic fake header. */
  def decodeStub(payload: Array[Byte]): Decoded = {
    val buf = java.nio.ByteBuffer.wrap(payload)
    val kind = buf.get() match { case 1 => "image"; case 2 => "audio"; case 3 => "video"; case _ => "unknown" }
    Decoded(kind, buf.getInt, buf.getInt, buf.getInt, payload.length - 13)
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frames", IntegerType, nullable = false),
    StructField("body_len", IntegerType, nullable = false)))

  case class DecodedRow(media_id: String, kind: String, width: Int, height: Int,
      frames: Int, body_len: Int)

  /** Batch decode: (media_id, payload binary) -> typed metadata rows. Typed
    * Dataset.mapPartitions (encoders, no DataFrame<->RDD hops — input_hint:
    * "no RDD unless forced"); batch-shaped, no per-row driver involvement. */
  def decode(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("payload")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val d = decodeStub(payload)
        DecodedRow(id, d.kind, d.width, d.height, d.frames, d.bodyLen)
      })
      .toDF()
  }

  /** Resize plan: target box fit preserving aspect ratio — metadata-level
    * transform (the real pixel op is behind the stubbed codec). */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide).cast("double") / greatest(col("width"), col("height"))))
      .withColumn("out_w", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_h", floor(col("height") * col("scale")).cast("int"))

  /** Frame sampling for video rows: every `stride`-th frame index. */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.where(col("kind") === "video")
      .withColumn("sampled_frames",
        sequence(lit(0), col("frames") - 1, lit(stride)))
      .withColumn("n_sampled", size(col("sampled_frames")))

  /** Deterministic fake feature vector from payload bytes (stands in for a
    * real embedding model; deterministic => testable plumbing). Typed
    * Dataset.mapPartitions, same rationale as decode. */
  def featurize(df: DataFrame, dims: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("media_id"), col("payload")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        var h = 0xcbf29ce484222325L
        bytes.foreach { b => h = (h ^ (b & 0xFFL)) * 0x100000001b3L }
        val feat = Array.tabulate(dims)(i =>
          ((Rng.splitmix64(h + i) >>> 11).toFloat / (1L << 53).toFloat) - 0.5f)
        (id, feat)
      })
      .toDF("media_id", "feature")
  }

  /** Synthetic media table generator (deterministic, typed range — no RDD). */
  def synthMedia(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, n.toLong, 1, math.max(1, n / 250)).as[Long]
      .map { iL =>
        val i = iL.toInt
        val kind = Seq("image", "audio", "video")(i % 3)
        val w = 64 + Rng.uniformInt(1000L + i, 4000)
        val h = 64 + Rng.uniformInt(2000L + i, 3000)
        val frames = if (kind == "video") 10 + Rng.uniformInt(3000L + i, 500) else 1
        (f"M$i%06d", makePayload(kind, w, h, frames, 4000L + i, 64 + i % 128))
      }
      .toDF("media_id", "payload")
  }
}
