package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

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
    img_w: Int,
    img_h: Int,
    avg_luma: Double,
    thumb_avg: Double,
    n_frames: Int,
)

/** Multimodal column plumbing with a REAL codec (SURVEY.md §2.4, m01).
  *
  * r4's decode was an honest stub (md5-byte statistics); r5 retires it:
  * the media table now carries genuine PNG payloads (java.awt.image +
  * javax.imageio — both in-JDK, no external codec), and the pipeline
  * ACTUALLY decodes them. The proof structure is the important part:
  * each image's layout is a deterministic function of (doc_id, n_chars)
  * — a two-band gray image — so the DuckDB oracle predicts the decoded
  * width/height/average-luma/thumbnail/frame stats ARITHMETICALLY,
  * without ever seeing the bytes. If the encode→decode round trip
  * corrupted a single pixel, the hash compare fails. PNG is lossless
  * truecolor, so exact pixel recovery is the codec's contract, not luck.
  */
object Multimodal {

  /** Image layout per document — all integer arithmetic shared verbatim
    * with the oracle: w in [16,47], h in [16,47], left band gray g1,
    * right band gray g2.
    */
  private def layout(id: Long, nChars: Long): (Int, Int, Int, Int) = (
    (16 + nChars % 32).toInt,
    (16 + (nChars * 7) % 32).toInt,
    (id % 256).toInt,
    ((id * 7 + 31) % 256).toInt,
  )

  /** Derive the media corpus from `documents`: one real PNG per doc.
    * Encoding runs in `mapPartitions` so a real deployment could hold
    * one codec/featurizer context per partition; ImageIO's file-backed
    * stream cache is disabled once per partition (pure in-memory
    * encode).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val (w, h, g1, g2) = layout(id, nChars)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val wl  = w / 2
          var y   = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val g = if (x < wl) g1 else g2
              img.setRGB(x, y, (g << 16) | (g << 8) | g)
              x += 1
            }
            y += 1
          }
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          MediaRecord(id, out.toByteArray, w, h, "image/png")
        }
      }
  }

  /** The real decoder: PNG bytes in, pixel statistics out. Gray pixels
    * make integer luma exact ((r+g+b)/3 == g), so every downstream stat
    * is integer-derived and engine-portable:
    *  - avg_luma: mean over ALL pixels (sum as long, one IEEE divide)
    *  - thumb_avg: "resize" = deterministic stride-2 nearest-neighbor
    *    subsample in both dims (library scalers are not pinned across
    *    JDKs; an explicit subsample is), mean over the sampled grid
    *  - n_frames: "frame-sample" = take every 4th row as a frame
    */
  private def decode(r: MediaRecord): MediaFeatures = {
    val img = ImageIO.read(new ByteArrayInputStream(r.payload))
    val w   = img.getWidth
    val h   = img.getHeight
    var sum  = 0L
    var tsum = 0L
    var tn   = 0L
    var y    = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb  = img.getRGB(x, y)
        val luma = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
        sum += luma
        if (x % 2 == 0 && y % 2 == 0) { tsum += luma; tn += 1 }
        x += 1
      }
      y += 1
    }
    val frames = (h + 3) / 4 // rows 0, 4, 8, ...
    MediaFeatures(
      r.doc_id, w, h,
      math.round(sum.toDouble / (w * h) * 10000).toDouble / 10000,
      math.round(tsum.toDouble / tn * 10000).toDouble / 10000,
      frames,
    )
  }

  /** m01: full pipeline — binary column in, per-partition decode, typed
    * features out. mapPartitions (not map) so the decoder holds one
    * codec context per partition instead of per record.
    */
  def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .mapPartitions { it => ImageIO.setUseCache(false); it.map(decode) }
      .toDF()
  }
}
