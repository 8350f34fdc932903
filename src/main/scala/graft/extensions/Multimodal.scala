package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ops.Scalars

/** Multimodal columns for training-data pipelines (north-star extension):
  * image/audio/video as opaque `BINARY` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The Spark-side plumbing (schema, partition-local batched decode via
  * mapPartitions, deterministic outputs) is real and tested; the actual codec
  * work is behind [[MediaDecoder]] because no image/audio libraries exist in
  * this environment — [[FakeDecoder]] is the clearly-marked deterministic
  * stand-in (it derives plausible metadata from the content hash, so tests and
  * oracles are stable). A production deployment binds a real decoder
  * implementation; nothing else changes.
  */
object Multimodal {

  /** The asset relation: `(asset_id, mime, content BINARY, source)`. */
  case class AssetIn(asset_id: Long, mime: String, content: Array[Byte], source: String)

  /** Typed metadata produced by decode (+ optional feature vector). */
  case class AssetMeta(
      asset_id: Long,
      mime: String,
      byte_size: Long,
      content_sha256: String,
      width: Int,
      height: Int,
      duration_ms: Long,
      n_frames: Int,
      decode_ok: Boolean)

  /** Decoder boundary. Implementations are per-partition (construct once,
    * decode many — the mapPartitions batch shape below).
    */
  trait MediaDecoder extends Serializable {
    def decode(mime: String, content: Array[Byte]): (Int, Int, Long) // (w, h, durationMs)
  }

  /** STUB — deterministic fake: derives (w, h, duration) from the content's
    * SHA-256 so every engine/test reproduces it. A real build replaces this
    * with an actual codec binding; the pipeline shape is unchanged.
    */
  final class FakeDecoder extends MediaDecoder {
    override def decode(mime: String, content: Array[Byte]): (Int, Int, Long) = {
      val sha = java.security.MessageDigest.getInstance("SHA-256").digest(content)
      def ub(i: Int): Int = sha(i) & 0xff
      val w = 64 + ub(0) * 4
      val h = 64 + ub(1) * 4
      val dur = if (mime.startsWith("video") || mime.startsWith("audio"))
        1000L + ub(2) * 997L else 0L
      (w, h, dur)
    }
  }

  /** Decode stage: binary assets → typed metadata, batched per partition
    * (one decoder instance per partition; content bytes never leave the
    * executor — only metadata comes back).
    */
  def decodeAssets(assets: DataFrame, decoderFactory: () => MediaDecoder = () => new FakeDecoder): Dataset[AssetMeta] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "mime", "content", "source").as[AssetIn]
      .mapPartitions { it =>
        lazy val decoder = decoderFactory()
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { a =>
          val sha = md.digest(a.content).map("%02x".format(_)).mkString
          md.reset()
          try {
            val (w, h, dur) = decoder.decode(a.mime, a.content)
            val frames = if (dur > 0) (dur / 40L).toInt max 1 else 1 // 25 fps equivalent
            AssetMeta(a.asset_id, a.mime, a.content.length.toLong, sha, w, h, dur, frames, decode_ok = true)
          } catch {
            case _: Exception =>
              AssetMeta(a.asset_id, a.mime, a.content.length.toLong, sha, 0, 0, 0L, 0, decode_ok = false)
          }
        }
      }
  }

  /** Frame sampling: `n` evenly-spaced frame indices per decoded asset —
    * pure column math over the metadata (the heavy pixel work would live in a
    * decoder-side stage; the plan shape is what matters at scale: explode AFTER
    * metadata pruning, never before).
    */
  def sampleFrames(meta: DataFrame, n: Int): DataFrame =
    meta.filter(col("decode_ok") && col("n_frames") > 0)
      .select(col("asset_id"),
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => least(floor(i * col("n_frames") / lit(n)).cast("int"), col("n_frames") - 1))).as("frame_idx"))
      .distinct()

  /** Resize stage stub: target box + preserved aspect ratio as metadata. */
  def resizePlan(meta: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(lit(maxSide) / greatest(col("width"), col("height")).cast("double"), lit(1.0))
    meta.withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Adapter for the oracle/tests: the documents table as fake image assets. */
  def documentsAsAssets(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet").select(
      col("doc_id").as("asset_id"),
      Scalars.mimeFromExtension(
        when(col("doc_id") % 3 === 0, ".png").when(col("doc_id") % 3 === 1, ".jpg")
          .otherwise(".tif")).as("mime"),
      encode(col("text"), "UTF-8").as("content"),
      col("source"))
}
