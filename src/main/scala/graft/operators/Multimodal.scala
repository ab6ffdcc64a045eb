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

case class VideoRecord(
    doc_id: Long,
    payload: Array[Byte],
    n_frames: Int,
    width: Int,
    height: Int,
    format: String,
)

case class VideoFeatures(
    doc_id: Long,
    n_frames: Long,
    n_sampled: Long,
    vid_w: Long,
    vid_h: Long,
    avg_luma: Double,
)

case class AudioRecord(
    doc_id: Long,
    payload: Array[Byte],
    sample_rate: Int,
    n_samples: Int,
    format: String,
)

case class AudioFeatures(
    doc_id: Long,
    sample_rate: Long,
    n_samples: Long,
    duration_ms: Long,
    peak: Long,
    mean_abs: Double,
    n_zero_cross: Long,
    n_windows: Long,
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
      // r16: the documents scan is ONE task (single row group), so
      // without this the whole codec stage — the pipeline's actual
      // work — runs serially. Round-robin the tiny (id, nChars) rows
      // across the cluster's cores before the expensive per-row encode
      // (guide §1.2: fix the distributed algorithm first). Explicit
      // count, sized from the runtime: AQE would coalesce a keyless
      // exchange of KB-scale rows back to one partition.
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val (w, h, g1, g2) = layout(id, nChars)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val wl  = w / 2
          // bulk raster write: one setRGB(int[]) call per image, not one
          // per pixel (identical stored pixels, ~3x less call overhead)
          val px = new Array[Int](w * h)
          var i = 0
          while (i < px.length) {
            val g = if (i % w < wl) g1 else g2
            px(i) = (g << 16) | (g << 8) | g
            i += 1
          }
          img.setRGB(0, 0, w, h, px, 0, w)
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
    // bulk raster read (r16): one getRGB(int[]) per image instead of a
    // per-pixel call — same values, the conversion runs once
    val px   = img.getRGB(0, 0, w, h, null, 0, w)
    var sum  = 0L
    var tsum = 0L
    var tn   = 0L
    var y    = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb  = px(y * w + x)
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

  /** Audio waveform per document — all integer arithmetic shared
    * verbatim with the oracle: a two-band square wave (amplitude a1 for
    * the first half of the samples, a2 for the second; sign flips every
    * `hp` samples), so every decoded statistic is a closed-form integer
    * function of (doc_id, n_chars).
    */
  private def audioLayout(id: Long, nChars: Long): (Int, Int, Int, Int, Int) = (
    (2048 + (nChars * 31) % 2048).toInt, // n samples
    (8000 + (id % 4) * 4000).toInt,      // sample rate
    (16 + id % 48).toInt,                // half-period in samples
    (1000 + (id * 13) % 20000).toInt,    // first-band amplitude
    (1000 + (nChars * 17) % 20000).toInt, // second-band amplitude
  )

  /** Canonical RIFF/PCM16-mono-LE WAV container around raw sample bytes
    * (r17): the fixed 44-byte header + payload, BYTE-IDENTICAL to what
    * `javax.sound`'s WaveFileWriter emits for this format
    * (WavCodecSpec asserts equality against the JDK writer across the
    * fleet's layouts). Hand-rolled because AudioSystem serializes every
    * open/write on a global provider-registry lock — the r16 measurement
    * showed 32 concurrent codec tasks running 2.2× SLOWER than one; this
    * codec is lock-free, so the audio tier parallelizes like the image
    * tier.
    */
  private[operators] def wavEncode(data: Array[Byte], rate: Int): Array[Byte] = {
    val n   = data.length
    val out = new Array[Byte](44 + n)
    val bb  = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n).put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1)                   // PCM, mono
      .putInt(rate).putInt(rate * 2)             // sample rate, byte rate
      .putShort(2).putShort(16)                  // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(n).put(data)
    out
  }

  /** The matching parser: a real RIFF chunk walk (fmt read, unknown
    * chunks skipped with even padding, data located by id — the header
    * is parsed, not assumed at fixed offsets), returning (sampleRate,
    * PCM bytes). Accepts exactly the canonical PCM16 mono files this
    * engine writes; anything else fails loudly.
    */
  private[operators] def wavDecode(payload: Array[Byte]): (Int, Array[Byte]) = {
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int) = new String(payload, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE", "not a RIFF/WAVE payload")
    var pos = 12
    var rate = -1
    var data: Array[Byte] = null
    while (data == null || rate < 0) {
      require(pos + 8 <= payload.length, "truncated WAV: chunk walk ran off the payload")
      val id  = fourcc(pos)
      val len = bb.getInt(pos + 4)
      if (id == "fmt ") {
        require(bb.getShort(pos + 8) == 1 && bb.getShort(pos + 10) == 1 &&
          bb.getShort(pos + 22) == 16, "wavDecode expects PCM16 mono")
        rate = bb.getInt(pos + 12)
      } else if (id == "data") {
        data = java.util.Arrays.copyOfRange(payload, pos + 8, pos + 8 + len)
      }
      pos += 8 + len + (len & 1) // RIFF chunks pad to even length
    }
    (rate, data)
  }

  /** m02's media side: one genuine RIFF/PCM16 WAV per doc — the
    * canonical container via [[wavEncode]] (spec-pinned byte-equal to
    * the JDK writer); payload bytes are a real parseable audio file,
    * not a naked sample buffer.
    */
  def audioTable(spark: SparkSession, dir: String): Dataset[AudioRecord] = {
    import spark.implicits._
    graft.sources.Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      // r17: the lock-free codec parallelizes — the shuffled rows are
      // KB-scale (doc_id, n_chars) metadata, never payloads (guide §8);
      // r16 had to keep this serial because javax.sound's global
      // provider lock made 32 concurrent tasks 2.2× slower than one
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { case (id, nChars) =>
          val (n, rate, hp, a1, a2) = audioLayout(id, nChars)
          val data = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val amp = if (i < n / 2) a1 else a2
            val v   = if ((i / hp) % 2 == 0) amp else -amp
            data(2 * i) = (v & 0xff).toByte
            data(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          AudioRecord(id, wavEncode(data, rate), rate, n, "audio/wav")
        }
      }
  }

  /** The real audio decoder: WAV bytes in through the [[wavDecode]]
    * RIFF parser (header parsed from the container, not assumed),
    * sample statistics out — all integer-derived so the oracle can
    * predict them arithmetically:
    *  - duration_ms: integral n·1000/rate
    *  - peak / mean_abs over the decoded samples
    *  - n_zero_cross: strict sign flips between consecutive samples
    *  - n_windows: "frame-sample" analogue — ceil(n/256) fixed windows
    */
  private def decodeAudio(r: AudioRecord): AudioFeatures = {
    val (rateInt, bytes) = wavDecode(r.payload)
    val rate  = rateInt.toLong
    val n     = bytes.length / 2
    var i = 0; var sumAbs = 0L; var peak = 0L; var zc = 0L; var prev = 0
    while (i < n) {
      val v = (((bytes(2 * i + 1): Int) << 8) | (bytes(2 * i) & 0xff)).toShort.toInt
      val a = math.abs(v)
      sumAbs += a
      if (a > peak) peak = a
      if (i > 0 && ((v > 0) != (prev > 0))) zc += 1
      prev = v
      i += 1
    }
    AudioFeatures(
      r.doc_id, rate, n.toLong, n.toLong * 1000L / rate, peak,
      math.round(sumAbs.toDouble / n * 10000).toDouble / 10000,
      zc, (n.toLong + 255L) / 256L,
    )
  }

  /** Video layout per document: m01's two-band frame animated — frame f
    * carries grays (g1+5f)%256 / (g2+11f)%256 at the doc's (w, h);
    * `4 + id%5` frames per doc. Same oracle principle: every pixel of
    * every frame is a closed-form integer function of (doc_id, n_chars,
    * f).
    */
  private def videoLayout(id: Long, nChars: Long): (Int, Int, Int, Int, Int) = {
    val (w, h, g1, g2) = layout(id, nChars)
    (w, h, g1, g2, (4 + id % 5).toInt)
  }

  /** m03's media side: a per-doc VIDEO as real PNG frames in a
    * length-prefixed container (`GVID` magic, frame count, then
    * int-length + PNG bytes per frame). The JDK ships no video
    * container, so the container is hand-rolled AND DOCUMENTED — but
    * every frame is a genuine codec artifact, which is where the
    * decode work actually lives.
    */
  def videoTable(spark: SparkSession, dir: String): Dataset[VideoRecord] = {
    import spark.implicits._
    graft.sources.Tables
      .documents(spark, dir)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .repartition(spark.sparkContext.defaultParallelism) // r16: parallelize the codec (see mediaTable)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, nChars) =>
          val (w, h, g1, g2, nf) = videoLayout(id, nChars)
          val out = new ByteArrayOutputStream()
          val dos = new java.io.DataOutputStream(out)
          dos.writeBytes("GVID")
          dos.writeInt(nf)
          var f = 0
          while (f < nf) {
            val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
            val wl  = w / 2
            val fg1 = ((g1 + 5 * f) % 256); val fg2 = ((g2 + 11 * f) % 256)
            // bulk raster write per frame (r16; see mediaTable)
            val px = new Array[Int](w * h)
            var i = 0
            while (i < px.length) {
              val g = if (i % w < wl) fg1 else fg2
              px(i) = (g << 16) | (g << 8) | g
              i += 1
            }
            img.setRGB(0, 0, w, h, px, 0, w)
            val frame = new ByteArrayOutputStream()
            ImageIO.write(img, "png", frame)
            val bytes = frame.toByteArray
            dos.writeInt(bytes.length)
            dos.write(bytes)
            f += 1
          }
          VideoRecord(id, out.toByteArray, nf, w, h, "video/x-graft-png")
        }
      }
  }

  /** The video decoder: container parse + REAL PNG decode of every
    * SAMPLED frame (every 2nd — the frame-sample step a feature
    * extractor runs instead of decoding all frames), pixel-exact luma
    * mean over the sampled frames.
    */
  private def decodeVideo(r: VideoRecord): VideoFeatures = {
    val in    = new java.io.DataInputStream(new ByteArrayInputStream(r.payload))
    val magic = new Array[Byte](4); in.readFully(magic)
    require(new String(magic, "US-ASCII") == "GVID", s"doc ${r.doc_id}: bad container")
    val nf  = in.readInt()
    var sum = 0L; var pixels = 0L; var sampled = 0L
    var w = 0; var h = 0
    var f = 0
    while (f < nf) {
      val len   = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      if (f % 2 == 0) { // frame-sample: decode every 2nd frame only
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        w = img.getWidth; h = img.getHeight
        // bulk raster read per sampled frame (r16; see mediaTable)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          i += 1
        }
        pixels += w.toLong * h
        sampled += 1
      }
      f += 1
    }
    VideoFeatures(
      r.doc_id, nf.toLong, sampled, w.toLong, h.toLong,
      math.round(sum.toDouble / pixels * 10000).toDouble / 10000,
    )
  }

  /** m03: the video pipeline — container parse, every-2nd-frame REAL
    * PNG decode, luma statistics; completes the image/audio/video
    * triad with the oracle predicting decoded stats arithmetically.
    */
  def videoPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    videoTable(spark, dir)
      .mapPartitions { it => ImageIO.setUseCache(false); it.map(decodeVideo) }
      .toDF()
  }

  /** m02: the audio pipeline — same contract as m01 with a REAL audio
    * codec: encode genuine WAVs, decode them through the RIFF parser, emit
    * typed features; corrupting one sample in the container round trip
    * fails the hash compare.
    */
  def audioPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    audioTable(spark, dir).mapPartitions(_.map(decodeAudio)).toDF()
  }

  /** d18 image layout — a 9×8 grid of 2×2 gray blocks (an 18×16 PNG).
    * Cell grays mix doc identity nonlinearly enough that unrelated docs
    * get ~independent dHash bits, while staying CLOSED-FORM so the
    * oracle predicts every hash arithmetically (the m01 discipline):
    * h = (base·1103515245 + 12345) mod (2³¹−1), injective on this id
    * range; g(c,r) = (h+k)² mod (2³¹−1) mod 251 with k = c·8+r+17. The
    * QUADRATIC is the point: a linear h·k form stays linear mod 251
    * whenever h·k doesn't wrap the prime, so whole families of docs
    * shared hashes (measured: 42 accidental pairs at sf0.01, one exact);
    * with the square, two docs differ cellwise by (h₁−h₂)(h₁+h₂+2k) —
    * k-dependent, so cross-doc bits decorrelate and unrelated docs sit
    * near hamming 32. Every 50th doc (id ≡ 1 mod 50) is a PLANTED
    * near-dup of id−1: same h, ONE cell perturbed +100 mod 251 — only
    * the ≤2 dHash comparisons touching that cell can flip, so the pair
    * sits at hamming ≤ 2 (typically 1, not 0: the +100 usually crosses
    * one neighbor), inside any sane threshold. All arithmetic < 2⁶³
    * ((h+k)² < 2⁶² — safe at every SF).
    */
  private def d18Grays(id: Long): Array[Int] = {
    val pert = id % 50 == 1
    val base = if (pert) id - 1 else id
    val h    = (base * 1103515245L + 12345L) % 2147483647L
    val c0   = (id % 9).toInt
    val r0   = (id % 8).toInt
    val g    = new Array[Int](72)
    var c = 0
    while (c < 9) {
      var r = 0
      while (r < 8) {
        val k = c * 8 + r + 17
        var v = ((h + k) * (h + k) % 2147483647L % 251L).toInt
        if (pert && c == c0 && r == r0) v = (v + 100) % 251
        g(c * 8 + r) = v
        r += 1
      }
      c += 1
    }
    g
  }

  /** d18: perceptual image dedup — dHash over REALLY decoded PNGs. The
    * classic pipeline end to end: encode a genuine PNG per doc
    * (java.awt + ImageIO, the m01 codec), DECODE it back, downsample
    * the decoded pixels to the 9×8 dHash grid (deterministic stride-2
    * nearest neighbor — the m01 thumbnail discipline; library scalers
    * are not pinned across JDKs), take the 64 horizontal luma-gradient
    * bits (bit set iff left < right), and carry the fingerprint as four
    * 16-bit chunks (the d04 representation — bucket keys and the
    * hamming verify stay in small positive ints, no int64 sign-bit
    * gymnastics on either engine).
    *
    * Candidate generation is d04's pigeonhole: hamming ≤ 3 over 64 bits
    * in 4 chunks forces ≥ 1 chunk EQUAL, so a self-join on
    * (chunk_idx, chunk_key) finds every qualifying pair; the exact
    * bit_count verify runs only inside buckets. At 100 TB: encode +
    * decode + hash is one mapPartitions pass (a codec context per
    * partition, cost linear in media bytes); the join shuffles the
    * 4×|docs| chunk table on its bucket key — never pixels, never
    * all-pairs. The oracle replays the arithmetic layout AND does the
    * brute-force all-pairs hamming scan, so the compare also proves the
    * banded bucketing is COMPLETE (finds everything brute force finds).
    */
  def imageDedupDhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val sigs = graft.sources.Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // r16: parallelize the codec (see mediaTable)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          // encode a real PNG: 18×16, pixel (x, y) = cell (x/2, y/2)
          val g   = d18Grays(id)
          val img = new BufferedImage(18, 16, BufferedImage.TYPE_INT_RGB)
          // bulk raster write (r16; see mediaTable)
          val px = new Array[Int](18 * 16)
          var i = 0
          while (i < px.length) {
            val v = ((i % 18) / 2) * 8 + ((i / 18) / 2)
            val gv = g(v)
            px(i) = (gv << 16) | (gv << 8) | gv
            i += 1
          }
          img.setRGB(0, 0, 18, 16, px, 0, 18)
          val out = new ByteArrayOutputStream()
          ImageIO.write(img, "png", out)
          // decode it back and dHash the DECODED pixels
          val dec  = ImageIO.read(new ByteArrayInputStream(out.toByteArray))
          val dpx  = dec.getRGB(0, 0, 18, 16, null, 0, 18)
          def luma(c: Int, r: Int): Int = {
            val rgb = dpx((2 * r) * 18 + 2 * c) // stride-2 nearest neighbor
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          }
          val chunks = new Array[Long](4)
          var r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              if (luma(c, r) < luma(c + 1, r))
                chunks(r / 2) |= 1L << ((r % 2) * 8 + c)
              c += 1
            }
            r += 1
          }
          (id, chunks(0), chunks(1), chunks(2), chunks(3))
        }
      }
      .toDF("doc_id", "c0", "c1", "c2", "c3")
    val buckets = sigs.select(
      col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
        .as(Seq("chunk_idx", "chunk_key")))
    val hamming = (0 until 4)
      .map(k => bit_count(col(s"x.c$k").bitwiseXOR(col(s"y.c$k"))))
      .reduce(_ + _)
    buckets
      .as("x")
      .join(buckets.as("y"), Seq("chunk_idx", "chunk_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming.cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** d20: perceptual VIDEO dedup — the d18/d19 discipline completing
    * the image/audio/video triple: each doc renders a 4-frame animation
    * (the d18 9×8 cell grid with per-frame gray drift `+13·f mod 251`),
    * every frame is REALLY encoded as a PNG and decoded back (ImageIO,
    * the m01/m03 codec), and each decoded frame contributes a 32-bit
    * dHash chunk (8 gradient comparisons × 4 sampled rows). The
    * temporal fingerprint is the 4 per-frame chunks — banded hamming
    * buckets on `(frame_idx, chunk)` with the exact in-bucket verify:
    * a pair within hamming ≤ 3 has ≥ 1 untouched frame chunk
    * (pigeonhole), so the bucket join is complete. Planted near-dups:
    * `id % 50 == 1` replays doc `id−1`'s animation with ONE cell of ONE
    * frame perturbed (+100 gray) — at most two gradient bits of that
    * frame flip; unrelated docs differ in ~half of all 128 bits. The
    * oracle replays the cell arithmetic (never the PNG bytes): a
    * corrupted encode→decode round trip on ANY frame fails the hash.
    *
    * Scale: fingerprinting is scan-shaped codec work (mapPartitions, no
    * pixel shuffle); candidate pairs ∝ chunk-bucket occupancy.
    */
  def videoDedupFingerprint(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val sigs = graft.sources.Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      .repartition(spark.sparkContext.defaultParallelism) // r16: parallelize the codec (see mediaTable)
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { id =>
          val pert = id % 50 == 1
          val base = if (pert) id - 1 else id
          val h    = (base * 1103515245L + 12345L) % 2147483647L
          val (c0, r0, p0) = ((id % 9).toInt, (id % 8).toInt, (id % 4).toInt)
          val chunks = new Array[Long](4)
          var f = 0
          while (f < 4) {
            val img = new BufferedImage(18, 16, BufferedImage.TYPE_INT_RGB)
            // bulk raster write per frame (r16; see mediaTable)
            val px = new Array[Int](18 * 16)
            var c = 0
            while (c < 9) {
              var r = 0
              while (r < 8) {
                val k = c * 8 + r + 17
                var v = (((h + k) * (h + k) % 2147483647L % 251L + 13L * f) % 251L).toInt
                if (pert && f == p0 && c == c0 && r == r0) v = (v + 100) % 251
                val rgb = (v << 16) | (v << 8) | v
                var y = 2 * r
                while (y < 2 * r + 2) {
                  px(y * 18 + 2 * c) = rgb
                  px(y * 18 + 2 * c + 1) = rgb
                  y += 1
                }
                r += 1
              }
              c += 1
            }
            img.setRGB(0, 0, 18, 16, px, 0, 18)
            val out = new ByteArrayOutputStream()
            ImageIO.write(img, "png", out)
            val dec = ImageIO.read(new ByteArrayInputStream(out.toByteArray))
            val dpx = dec.getRGB(0, 0, 18, 16, null, 0, 18)
            def luma(cc: Int, rr: Int): Int = {
              val rgb = dpx((2 * rr) * 18 + 2 * cc)
              (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
            }
            var r2 = 0
            while (r2 < 8) { // sampled rows 0,2,4,6 → 4 × 8 gradient bits
              var cc = 0
              while (cc < 8) {
                if (luma(cc, r2) < luma(cc + 1, r2))
                  chunks(f) |= 1L << ((r2 / 2) * 8 + cc)
                cc += 1
              }
              r2 += 2
            }
            f += 1
          }
          (id, chunks(0), chunks(1), chunks(2), chunks(3))
        }
      }
      .toDF("doc_id", "c0", "c1", "c2", "c3")
    val buckets = sigs.select(
      col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
        .as(Seq("chunk_idx", "chunk_key")))
    val hamming = (0 until 4)
      .map(k => bit_count(col(s"x.c$k").bitwiseXOR(col(s"y.c$k"))))
      .reduce(_ + _)
    buckets
      .as("x")
      .join(buckets.as("y"), Seq("chunk_idx", "chunk_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming.cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** d19's per-doc tone program: 33 frames × 64 samples of square wave;
    * frame `f` has closed-form amplitude and half-period derived from
    * the doc hash (the d18Grays discipline), with phase restarting at
    * each frame boundary so every per-frame statistic is frame-local.
    * Docs with `id % 50 == 1` replay doc `id−1`'s program with ONE
    * frame's amplitude nudged (+500 of ≤18 000) — the planted
    * audio near-dup, flipping at most the two energy-gradient bits
    * adjacent to that frame.
    */
  private def d19Hash(id: Long): (Long, Boolean, Int) = {
    val pert = id % 50 == 1
    val base = if (pert) id - 1 else id
    ((base * 1103515245L + 12345L) % 2147483647L, pert, (id % 33L).toInt)
  }
  private def d19Amp(h: Long, f: Int): Int =
    (1000L + (h + f * 31L) * (h + f * 31L) % 2147483647L % 17000L).toInt
  private def d19Hp(h: Long, f: Int): Int = (1L + (h + f * 7L) % 8L).toInt

  /** d19: perceptual AUDIO dedup — the chromaprint idea end to end on
    * real WAV bytes: encode a genuine RIFF/PCM16 file per doc
    * (the canonical m02 WAV codec), DECODE it back through the
    * actual parser, frame the decoded samples (33 × 64), and fingerprint
    * with 64 frame-gradient bits — 32 ENERGY gradients (sum |sample| per
    * frame, the loudness contour) + 32 ZERO-CROSSING gradients (sign
    * flips per frame, the pitch contour; PCM is lossless so both are
    * exact integers). The fingerprint rides as four 16-bit chunks: the
    * d04/d18 banded-hamming discipline — any pair within hamming ≤ 3
    * shares ≥ 1 untouched chunk (pigeonhole), so the chunk-bucket join
    * is COMPLETE, and the exact in-bucket hamming verify removes
    * collisions. The oracle never sees the WAV bytes: it predicts both
    * contours arithmetically from the tone program (energy = 64·amp;
    * crossings = ⌊63/hp⌋) — a corrupted encode→decode round trip or a
    * lossy frame split fails the hash compare.
    *
    * Scale: fingerprinting is a scan-shaped mapPartitions (codec work,
    * no shuffle); the pair space is cut to chunk buckets exactly as d03
    * cuts shingle space — candidates ∝ bucket occupancy, never n².
    */
  def audioDedupFingerprint(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    import spark.implicits._
    val nFrames = 33; val nf = 64
    val sigs = graft.sources.Tables
      .documents(spark, dir)
      .select(col("doc_id"))
      .as[Long]
      // r17: lock-free [[wavEncode]]/[[wavDecode]] — the codec stage
      // parallelizes over every core (the r16 AudioSystem lock is gone);
      // the shuffle moves 8-byte ids, never payloads
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        it.map { id =>
          val (h, pert, p0) = d19Hash(id)
          val n    = nFrames * nf
          val data = new Array[Byte](n * 2)
          var f = 0
          while (f < nFrames) {
            val amp = d19Amp(h, f) + (if (pert && f == p0) 500 else 0)
            val hp  = d19Hp(h, f)
            var i = 0
            while (i < nf) {
              val v   = if ((i / hp) % 2 == 0) amp else -amp
              val idx = f * nf + i
              data(2 * idx) = (v & 0xff).toByte
              data(2 * idx + 1) = ((v >> 8) & 0xff).toByte
              i += 1
            }
            f += 1
          }
          // decode through the real parser and measure the DECODED samples
          val bytes = wavDecode(wavEncode(data, 8000))._2
          val energy = new Array[Long](nFrames)
          val zc     = new Array[Long](nFrames)
          f = 0
          while (f < nFrames) {
            var i = 0; var e = 0L; var flips = 0L; var prev = 0
            while (i < nf) {
              val idx = f * nf + i
              val v = (((bytes(2 * idx + 1): Int) << 8) | (bytes(2 * idx) & 0xff)).toShort.toInt
              e += math.abs(v)
              if (i > 0 && ((v > 0) != (prev > 0))) flips += 1
              prev = v
              i += 1
            }
            energy(f) = e; zc(f) = flips
            f += 1
          }
          val chunks = new Array[Long](4)
          var b = 0
          while (b < 32) {
            if (energy(b) < energy(b + 1)) chunks(b / 16) |= 1L << (b % 16)
            if (zc(b) < zc(b + 1)) chunks(2 + b / 16) |= 1L << (b % 16)
            b += 1
          }
          (id, chunks(0), chunks(1), chunks(2), chunks(3))
        }
      }
      .toDF("doc_id", "c0", "c1", "c2", "c3")
    val buckets = sigs.select(
      col("doc_id"), col("c0"), col("c1"), col("c2"), col("c3"),
      posexplode(array(col("c0"), col("c1"), col("c2"), col("c3")))
        .as(Seq("chunk_idx", "chunk_key")))
    val hamming = (0 until 4)
      .map(k => bit_count(col(s"x.c$k").bitwiseXOR(col(s"y.c$k"))))
      .reduce(_ + _)
    buckets
      .as("x")
      .join(buckets.as("y"), Seq("chunk_idx", "chunk_key"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming.cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
