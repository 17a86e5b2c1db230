package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted via a batched `mapPartitions` pass.
  *
  * The decode step itself is a clearly-marked deterministic STUB (the
  * container has no image/audio codecs); everything Spark-side is real:
  * the binary column, the schema of the decoded output, per-partition
  * batch shape, and the downstream relational handling. Swapping
  * `StubDecoder` for a JNI/FFmpeg/ImageIO decoder changes no plumbing.
  *
  * Scale: decode is a narrow mapPartitions (no shuffle); media bytes never
  * pass through a shuffle — only extracted metadata/features do. Partition
  * sizing comes from `spark.sql.files.maxPartitionBytes` on the binary
  * source.
  */
object Multimodal {

  /** Decoded media metadata (what a real decoder would return). */
  case class MediaMeta(width: Int, height: Int, nFrames: Int, durationS: Double)

  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): MediaMeta
  }

  /** STUB decoder: pure deterministic function of the byte payload. A real
    * implementation would parse the container format here.
    */
  object StubDecoder extends MediaDecoder {
    def decode(mediaType: String, bytes: Array[Byte]): MediaMeta = {
      val n = bytes.length
      val first = if (n > 0) bytes(0) & 0xff else 0
      val width = 64 + n % 512
      val height = 64 + (first % 128) * 2
      val frames = if (mediaType == "video") 1 + n % 30 else 1
      val dur = if (mediaType == "audio") n / 1000.0 else 0.0
      MediaMeta(width, height, frames, dur)
    }
  }

  /** Synthesize a media table from the documents fixture: text bytes as
    * the opaque payload, media_type assigned round-robin.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      col("text").cast("binary").as("payload"))

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("duration_s", DoubleType),
    StructField("content_hash", StringType)))

  /** Batched decode over partitions — the real 100 TB plumbing. Batch
    * size mirrors what a GPU/codec batch would use.
    */
  def decode(media: DataFrame, decoder: MediaDecoder = StubDecoder,
             batchSize: Int = 32): DataFrame = {
    val enc = RowEncoder.encoderFor(decodedSchema)
    media.select("doc_id", "media_type", "payload").mapPartitions { it =>
      // one digest instance per partition (digest() resets it) — a
      // per-row getInstance is pure allocation churn on the hot path
      val md = java.security.MessageDigest.getInstance("MD5")
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val m = decoder.decode(mt, bytes)
          val hash = md.digest(bytes).map("%02x".format(_)).mkString
          Row(id, mt, bytes.length, m.width, m.height, m.nFrames, m.durationS, hash)
        }
      }
    }(enc)
  }

  /** Resize plan: scale decoded dims to fit a bounding box, preserving
    * aspect via integer arithmetic (deterministic, oracle-checkable).
    */
  def withResizePlan(decoded: DataFrame, maxSide: Int = 256): DataFrame =
    decoded
      .withColumn("scale_num", least(lit(maxSide), greatest(col("width"), col("height"))))
      .withColumn("out_w", (col("width") * col("scale_num") /
        greatest(col("width"), col("height"))).cast("int"))
      .withColumn("out_h", (col("height") * col("scale_num") /
        greatest(col("width"), col("height"))).cast("int"))
      .drop("scale_num")

  /** Frame sampling plan for videos: every k-th frame index, as an array
    * column (the real op would slice the decoded tensor batch).
    */
  def withFrameSample(decoded: DataFrame, stride: Int = 5): DataFrame =
    decoded.withColumn("sampled_frames",
      when(col("media_type") === "video",
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array().cast("array<int>")))

  /** Media dedup THROUGH the decode path — binary-column exact dedup,
    * the multimodal face of q23: payloads flow the real batched
    * mapPartitions decode (bytes never shuffle), and only the extracted
    * (type, content_hash, n_bytes) rows reach the duplicate group-by.
    * Oracle-checkable because the stub's content hash is a true md5 of
    * the payload bytes; a real decoder would swap in a perceptual hash
    * and the plumbing would not change. Reports per duplicate group the
    * keeper and the bytes a dedup pass would reclaim.
    */
  def q141MediaDedup(spark: SparkSession, dir: String): DataFrame =
    decode(mediaTable(spark, dir))
      .groupBy("media_type", "content_hash")
      .agg(count(lit(1)).as("n_copies"),
        sum(col("n_bytes").cast("long")).as("bytes_total"))
      // per-type SUMMARY (not the dup groups themselves): byte-exact
      // duplicates are rare at small scale factors, and an honest audit
      // reports zero reclaimable bytes rather than an empty table
      .groupBy("media_type")
      .agg(sum("n_copies").as("n_items"),
        count(lit(1)).as("n_distinct"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_groups"),
        sum(expr("bytes_total - bytes_total div n_copies")).as("bytes_reclaimable"))
      .orderBy("media_type")

  /** Full multimodal pipeline query: synth table → batched stub decode →
    * resize + frame-sample plans → per-item metadata rows.
    */
  def q37MediaPipeline(spark: SparkSession, dir: String): DataFrame =
    withFrameSample(withResizePlan(decode(mediaTable(spark, dir))))
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("width"),
        col("height"), col("n_frames"), round(col("duration_s"), 3).as("duration_s"),
        col("out_w"), col("out_h"), size(col("sampled_frames")).as("n_sampled"),
        col("content_hash"))
      .orderBy("doc_id")
}
