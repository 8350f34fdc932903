package graft.extensions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.ops.Scalars

/** Multimodal columns for training-data pipelines (north-star extension):
  * image/audio/video as opaque `BINARY` columns with typed metadata, plus the
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The decode boundary is [[MediaDecoder]]; the DEFAULT binding is
  * [[ImageIoDecoder]] — real, zero-dependency JDK codecs: `javax.imageio`
  * for png/jpeg/tiff/gif/bmp (the reference's whole image set,
  * worker.py:84-94) and `javax.sound.sampled` for wav/aiff/au durations.
  * [[FakeDecoder]] remains as a clearly-marked deterministic stand-in for
  * plumbing tests and for formats the JDK can't open (mp4/webm video —
  * binding a real video codec is a deployment concern; the pipeline shape
  * is unchanged).
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

  /** Real decoder over JDK-standard codecs — no new dependencies.
    *
    *  - image mimes → `javax.imageio`: header-only read
    *    (`ImageReader.getWidth/getHeight(0)`, never `ImageIO.read`) — at
    *    100 TB the difference between touching a few hundred header bytes
    *    and materializing every pixel buffer is the whole game. Covers the
    *    reference's supported set (worker.py:84-94: jpg/jpeg/png, plus
    *    JDK-SPI tiff/gif/bmp).
    *  - audio mimes → `javax.sound.sampled`: frame count / frame rate →
    *    duration, again without decoding samples (wav/aiff/au).
    *  - anything else (video) → IllegalArgumentException, which
    *    [[decodeAssets]] converts to a `decode_ok = false` metadata row.
    */
  final class ImageIoDecoder extends MediaDecoder {
    import java.io.ByteArrayInputStream

    override def decode(mime: String, content: Array[Byte]): (Int, Int, Long) =
      if (mime.startsWith("audio")) {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(content))
        try {
          val frames = in.getFrameLength
          val rate = in.getFormat.getFrameRate
          if (frames < 0 || rate <= 0)
            throw new IllegalArgumentException("unknown audio length")
          (0, 0, (frames * 1000L) / rate.toLong)
        } finally in.close()
      } else if (mime.startsWith("image")) {
        ImageIoDecoder.ensureNoDiskCache()
        val stream = javax.imageio.ImageIO.createImageInputStream(
          new ByteArrayInputStream(content))
        if (stream == null) throw new IllegalArgumentException("unreadable image stream")
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(stream)
          if (!readers.hasNext)
            throw new IllegalArgumentException(s"no ImageIO reader for $mime")
          val reader = readers.next()
          try {
            reader.setInput(stream, true, true)
            (reader.getWidth(0), reader.getHeight(0), 0L)
          } finally reader.dispose()
        } finally stream.close()
      } else {
        throw new IllegalArgumentException(s"no JDK codec for $mime")
      }
  }

  object ImageIoDecoder {
    // ImageIO's default stream cache writes a temp FILE per createImageInputStream
    // call — per-row disk I/O in the hot path. Memory-cached streams only.
    @volatile private var cacheDisabled = false
    private[extensions] def ensureNoDiskCache(): Unit =
      if (!cacheDisabled) { javax.imageio.ImageIO.setUseCache(false); cacheDisabled = true }
  }

  /** Deterministic fake: derives (w, h, duration) from the content's SHA-256
    * so every engine/test reproduces it bit-for-bit — for plumbing tests and
    * formats without a JDK codec. Production decode is [[ImageIoDecoder]].
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
  def decodeAssets(assets: DataFrame, decoderFactory: () => MediaDecoder = () => new ImageIoDecoder): Dataset[AssetMeta] = {
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

  /** Real media fixtures, distributed: each documents row becomes one real
    * encoded asset (png / jpeg / tiff image or pcm wav audio by `doc_id % 4`)
    * whose dimensions / duration are pure arithmetic in `doc_id` — so a SQL
    * oracle with no codec can re-derive what a correct decoder must report.
    * Encoding happens per-partition on executors (never on the driver): at
    * scale this is the write half of a real multimodal ingest.
    *
    *  - image: width = 16 + doc_id % 97, height = 16 + doc_id % 61
    *  - audio: 8-bit mono PCM at 8 kHz, frames = 800 + (doc_id % 400) * 8
    *    → duration_ms = frames / 8 (exact integer math)
    */
  def syntheticMediaAssets(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (docId, source) =>
          val kind = (docId % 4).toInt
          val (mime, bytes) = kind match {
            case 0 => ("image/png", encodeImage(docId, "png"))
            case 1 => ("image/jpeg", encodeImage(docId, "jpg"))
            case 2 => ("image/tiff", encodeImage(docId, "tif"))
            case _ => ("audio/wav", encodeWav(docId))
          }
          AssetIn(docId, mime, bytes, source)
        }
      }.toDF()
  }

  private def encodeImage(docId: Long, format: String): Array[Byte] = {
    val w = 16 + (docId % 97).toInt
    val h = 16 + (docId % 61).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // a non-constant pixel so encoders can't degenerate-case the content
    img.setRGB((docId % w).toInt, (docId % h).toInt, 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    if (!javax.imageio.ImageIO.write(img, format, baos))
      throw new IllegalStateException(s"no ImageIO writer for $format")
    baos.toByteArray
  }

  private def encodeWav(docId: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val nFrames = 800 + (docId % 400) * 8 // divisible by 8 → exact ms at 8 kHz
    val fmt = new AudioFormat(8000f, 8, 1, false, false) // 1 byte per frame
    val pcm = new Array[Byte](nFrames.toInt)
    java.util.Arrays.fill(pcm, (docId % 251).toByte)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
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
