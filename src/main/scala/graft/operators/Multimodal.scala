package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque payload bytes + typed metadata, the schema
  * a 100 TB image/audio corpus would use (payload column stays opaque and
  * columnar-compressed; metadata prunes without touching bytes).
  */
case class MediaRecord(
    doc_id: Long,
    payload: Array[Byte],
    width: Int,
    height: Int,
    format: String,
)

case class MediaFeatures(
    doc_id: Long,
    n_bytes: Int,
    avg_byte: Double,
    thumb_bytes: Int,
    n_frames: Int,
)

/** Multimodal column plumbing (SURVEY.md §2.4, m01).
  *
  * The decode step is STUBBED with a deterministic fake (this container has
  * no image/audio codecs): payload = md5(text) bytes, "decode" = byte
  * statistics, "resize" = prefix slice, "frame-sample" = stride slice.
  * Everything around the stub — binary column handling, typed metadata,
  * Dataset encoders, per-partition batch processing, partition-count
  * preservation — is the real production shape: swap `decodeStub` for a
  * codec call and nothing else changes.
  */
object Multimodal {

  /** Derive a deterministic fake media corpus from `documents`. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        unhex(md5(col("text"))).as("payload"),
        (pmod(col("n_chars"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("n_chars") * 7, lit(64)) + 16).cast("int").as("height"),
        lit("fake/raw").as("format"),
      )
      .as[MediaRecord]
  }

  /** The stubbed decoder — one call per record, batched per partition the
    * way a real codec (or model featurizer) would be.
    */
  private def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes   = r.payload
    val avg     = if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
    val thumb   = bytes.take(8) // "resize": keep a prefix
    val frames  = bytes.indices.count(_ % 4 == 0) // "frame-sample": stride 4
    MediaFeatures(r.doc_id, bytes.length, math.round(avg * 10000).toDouble / 10000, thumb.length, frames)
  }

  /** m01: full pipeline — binary column in, per-partition decode, typed
    * features out. mapPartitions (not map) so a real decoder could hold
    * one codec context per partition instead of per record.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }
}
