package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.D): media as opaque binary
  * columns + typed metadata, with the decode/feature-extract step behind a
  * deterministic STUB (no image/audio codecs in this environment — the
  * Spark-side schema, typed Dataset plumbing, partition-iterator batch
  * shape, and downstream joins are the real, tested part).
  */
object MultimodalOps {

  /** Raw media record: payload is the opaque binary column. */
  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features; width/height/frames come from the stub decoder. */
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
      width: Int, height: Int, frames: Int, checksum: String)

  /** STUB decoder — stands in for an image/audio/video codec call. Real
    * implementations would decode `payload` here (per-partition, so codec
    * contexts are reused across the batch); the fake is deterministic
    * arithmetic on the byte length so the oracle can replicate it.
    */
  private def decodeStub(rec: MediaRecord): MediaFeatures = {
    val len = rec.payload.length.toLong
    val md = java.security.MessageDigest.getInstance("MD5")
    val checksum = md.digest(rec.payload).map("%02x".format(_)).mkString
    MediaFeatures(
      rec.doc_id, rec.media_type, len,
      width = (64L + len % 64L).toInt,
      height = (64L + (len * 7L) % 64L).toInt,
      frames = (1L + len % 30L).toInt,
      checksum = checksum)
  }

  /** Frame sampling over the (stub-)decoded video rows: every `step`-th
    * frame index with its byte offset — the Spark-side shape of a frame
    * extractor (explode keeps it one scan; a real decoder would read the
    * offsets per partition). Deterministic arithmetic, oracle-checked.
    */
  def frameSample(spark: SparkSession, documents: DataFrame, step: Int = 5): DataFrame = {
    import spark.implicits._
    val meta = multimodalMeta(spark, documents).toDF()
    meta.filter(col("media_type") === "video")
      .select(col("doc_id"), col("byte_len"), col("frames"),
        explode(sequence(lit(0), col("frames") - 1, lit(step))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // integer floor-division (`div`) — `/` would detour through
        // doubles and round differently than the oracle's `//`
        expr("frame_idx * (byte_len div greatest(frames, 1))").as("byte_offset"))
  }

  /** Resized media record: stub resize plan for a target box. */
  case class ResizedMedia(doc_id: Long, media_type: String, width: Int, height: Int,
      target_w: Int, target_h: Int, scale_pct: Long)

  /** STUB resize — a real implementation would decode `payload`, resample
    * to fit the target box and re-encode; the stub computes the
    * aspect-preserving integer resize plan (the part a pipeline actually
    * joins/filters on) with pure integer arithmetic the oracle replicates.
    */
  def resizeStub(f: MediaFeatures, targetBox: Int): ResizedMedia = {
    // scale percent = floor(100 * target / longest side)
    val longest = math.max(f.width, f.height).toLong
    val scalePct = 100L * targetBox / longest
    ResizedMedia(f.doc_id, f.media_type, f.width, f.height,
      (f.width.toLong * scalePct / 100L).toInt,
      (f.height.toLong * scalePct / 100L).toInt,
      scalePct)
  }

  /** Image rows → per-partition stub resize to fit a 96-px box. */
  def resizePlan(spark: SparkSession, documents: DataFrame, targetBox: Int = 96): Dataset[ResizedMedia] = {
    import spark.implicits._
    multimodalMeta(spark, documents)
      .filter(_.media_type == "image")
      .mapPartitions(_.map(resizeStub(_, targetBox)))
  }

  /** Documents → synthetic media payloads (utf-8 bytes as the opaque
    * binary) → per-partition stub decode → typed features Dataset.
    */
  def multimodalMeta(spark: SparkSession, documents: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    val media = documents.select(
      col("doc_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
    // mapPartitions (not map) so a real codec would amortize init per batch.
    media.mapPartitions(_.map(decodeStub))
  }
}
