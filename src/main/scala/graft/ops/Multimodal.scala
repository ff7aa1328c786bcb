package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata; decode / feature-extraction /
  * resize / frame-sampling run per-partition over the binary batches.
  *
  * Decoding is REAL for the formats that dominate a web crawl's media
  * columns — baseline AND progressive JPEG via [[graft.kernel.Jpeg]]
  * (from-scratch huffman + dequant + IDCT), lossless WebP via
  * [[graft.kernel.WebP]] (VP8L: prefix codes, LZ77, colour cache, all
  * four transforms), and PNG (incl. indexed / Adam7 / 16-bit), GIF,
  * Motion-JPEG AVI, BMP, WAV (PCM / float / G.711) via
  * [[graft.kernel.Media]]. Formats that genuinely need an
  * external codec library (H.264-era video/audio codecs) are carried by
  * the deterministic fixture container
  * (`IMG1`/`AUD1`/`VID1`, see [[graft.fixtures.MediaGen]]) — those paths
  * are **STUBs for real codecs**: swap their bodies for ffmpeg bindings
  * and the rest (schema, typed Dataset plumbing, mapPartitions batch
  * shape, partitioning) is production-shaped and tested.
  */
object Multimodal {

  final case class Media(media_id: Long, doc_url: String, kind: String,
                         payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, codec: String,
                                 width: Int, height: Int, sample_rate: Int,
                                 n_frames: Int, n_bytes: Long,
                                 mean_level: Double, hist8: Seq[Long],
                                 thumb: Seq[Byte], thumb_bytes: Int,
                                 sampled_frames: Int,
                                 ok: Boolean, error: String)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def stats(b: Array[Byte], off: Int): (Double, Array[Long]) = {
    val hist = new Array[Long](8)
    var sum = 0L
    var i = off
    while (i < b.length) {
      val v = b(i) & 0xff
      sum += v
      hist(v >>> 5) += 1
      i += 1
    }
    val n = math.max(b.length - off, 1)
    (math.rint(sum.toDouble / n * 10000) / 10000, hist)
  }

  /** Real nearest-neighbor resample to at most 8×8 luminance bytes —
    * the actual "resize" operator for decoded images.
    */
  private[graft] def thumbnail2d(samples: Array[Int], w: Int, h: Int): Array[Byte] = {
    val tw = math.min(8, w); val th = math.min(8, h)
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      val sy = y * h / th
      var x = 0
      while (x < tw) {
        out(y * tw + x) = (samples(sy * w + x * w / tw) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Every-nth downsample of audio amplitudes to ≤64 bytes (|s|>>8). */
  private[graft] def thumbnail1d(samples: Array[Int]): Array[Byte] = {
    val n = math.min(64, samples.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      // long math: i * samples.length wraps Int past ~34M samples (any
      // mono 16-bit WAV over ~68 MB) and the negative index would fail a
      // perfectly valid large row
      out(i) = ((math.abs(samples((i.toLong * samples.length / n).toInt)) >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Features from a real decode: `mean_level` is the mean absolute
    * amplitude normalized to 0–255 (for 0–255 luminance that IS the mean
    * pixel), `hist8` buckets |sample| into 8 equal bands of the sample
    * range, `thumb` is a REAL nearest-neighbor resample (≤8×8 luminance
    * for images, ≤64 amplitude bytes for audio), and every-5th-frame
    * sampling stands in for frame extraction.
    */
  private def fromDecoded(m: Media, d: graft.kernel.Media.Decoded): MediaFeatures = {
    val hist = new Array[Long](8)
    var sum = 0L
    var i = 0
    while (i < d.samples.length) {
      val a = math.abs(d.samples(i))
      sum += a
      hist(math.min(7, a * 8 / (d.sampleMax + 1))) += 1
      i += 1
    }
    val n = math.max(d.samples.length, 1)
    val mean = math.rint(sum.toDouble / n / d.sampleMax * 255 * 10000) / 10000
    val sampled = if (d.frames <= 1) d.frames else (d.frames + 4) / 5
    val thumb =
      if (d.width > 0) thumbnail2d(d.samples, d.width, d.height)
      else thumbnail1d(d.samples)
    MediaFeatures(m.media_id, m.kind, d.codec, d.width, d.height, d.sampleRate,
      d.frames, m.payload.length.toLong, mean, hist.toSeq,
      thumb.toSeq, thumb.length, sampled, ok = true, error = "")
  }

  /** Dispatch by magic bytes: real decoders for BMP/WAV/PNG
    * ([[graft.kernel.Media]]); the fixture container path (STUB standing
    * in for codec-library formats) parses the header, computes raw-byte
    * statistics, emits a ≤64-byte "thumbnail" by stride-subsampling and
    * samples every 5th frame.
    */
  /** Metadata-only feature row for container formats whose payload
    * decode sits behind the codec-library boundary: header fields are
    * REAL, statistics/thumbnail cover the raw stream bytes.
    */
  private def containerRow(m: Media, codec: String, w: Int, h: Int,
                           rate: Int, frames: Int): MediaFeatures = {
    val (mean, hist) = stats(m.payload, 0)
    val tn = math.min(64, m.payload.length)
    val thumb = Array.tabulate(tn)(i =>
      m.payload((i.toLong * m.payload.length / tn).toInt))
    val sampled = if (frames <= 1) frames else (frames + 4) / 5
    MediaFeatures(m.media_id, m.kind, codec, w, h, rate, frames,
      m.payload.length.toLong, mean, hist.toSeq, thumb.toSeq, tn, sampled,
      ok = true, error = "")
  }

  def decodeOne(m: Media): MediaFeatures = try {
    if (graft.kernel.Media.isBmp(m.payload))
      fromDecoded(m, graft.kernel.Media.decodeBmp(m.payload))
    else if (graft.kernel.Media.isAvi(m.payload))
      fromDecoded(m, graft.kernel.Media.decodeAvi(m.payload))
    else if (graft.kernel.Media.isWav(m.payload))
      fromDecoded(m, graft.kernel.Media.decodeWav(m.payload))
    else if (graft.kernel.Media.isPng(m.payload))
      fromDecoded(m, graft.kernel.Media.decodePng(m.payload))
    else if (graft.kernel.Jpeg.isJpeg(m.payload))
      fromDecoded(m, graft.kernel.Jpeg.decode(m.payload))
    else if (graft.kernel.Media.isGif(m.payload))
      fromDecoded(m, graft.kernel.Media.decodeGif(m.payload))
    else if (graft.kernel.Media.isTiff(m.payload))
      fromDecoded(m, graft.kernel.Media.decodeTiff(m.payload))
    else if (graft.kernel.WebP.isWebP(m.payload))
      fromDecoded(m, graft.kernel.WebP.decode(m.payload))
    else if (graft.kernel.Flac.isFlac(m.payload))
      fromDecoded(m, graft.kernel.Flac.decode(m.payload))
    else if (graft.kernel.Media.isMp4(m.payload)) {
      // ISO-BMFF: container metadata is REAL (box walk — codec fourcc,
      // dimensions, duration, per-track sample counts). When the video
      // track's first sample is a payload this engine can decode from
      // scratch (MJPEG — 'jpeg'/'mjpa' fourcc or a JFIF magic), the
      // frame is EXTRACTED via stco/stsz and decoded, so mean/hist/thumb
      // come from real pixels exactly like the AVI path; for
      // codec-library formats (H.264-era) they fall back to raw mdat
      // statistics — the documented stub boundary.
      val info = graft.kernel.Media.probeMp4(m.payload)
      val vide = info.tracks.find(_.handler == "vide")
      val soun = info.tracks.find(_.handler == "soun")
      val frames = vide.map(_.sampleCount.toInt).getOrElse(0)
      val firstJpeg = vide.flatMap { v =>
        val off = v.firstSampleOffset
        val sz = v.firstSampleSize
        if (off > 0 && sz > 2 && off + sz <= m.payload.length) {
          val bytes = java.util.Arrays.copyOfRange(
            m.payload, off.toInt, (off + sz).toInt)
          if (graft.kernel.Jpeg.isJpeg(bytes))
            Some(graft.kernel.Jpeg.decode(bytes))
          else None
        } else None
      }
      firstJpeg match {
        case Some(d) =>
          fromDecoded(m, graft.kernel.Media.Decoded(
            vide.map(_.codec).getOrElse(d.codec), d.width, d.height,
            soun.map(_.sampleRate).getOrElse(0), frames,
            d.samples, d.sampleMax))
        case None =>
          // H.264 tracks: the avcC SPS is codec-level truth for the
          // dimensions (container and bitstream disagree on cropped /
          // anamorphic streams; the bitstream wins)
          val sps =
            if (vide.exists(v => v.codec == "avc1" || v.codec == "avc3"))
              graft.kernel.Media.avcSps(m.payload)
            else None
          val dataOff = if (info.mdatOffset >= 0) info.mdatOffset else m.payload.length
          val (mean, hist) = stats(m.payload, dataOff)
          val body = m.payload.length - dataOff
          val tn = math.min(64, body)
          val thumb = Array.tabulate(tn)(i => m.payload(dataOff + (i.toLong * body / tn).toInt))
          val sampled = if (frames <= 1) frames else (frames + 4) / 5
          MediaFeatures(m.media_id, m.kind,
            vide.orElse(soun).map(_.codec).getOrElse(info.brand),
            sps.map(_.width).orElse(vide.map(_.width)).getOrElse(0),
            sps.map(_.height).orElse(vide.map(_.height)).getOrElse(0),
            soun.map(_.sampleRate).getOrElse(0), frames,
            m.payload.length.toLong, mean, hist.toSeq, thumb.toSeq, tn, sampled,
            ok = true, error = "")
      }
    } else if (graft.kernel.Webm.isWebm(m.payload)) {
      // Matroska/WebM: container metadata from the EBML walk; for V_VP8
      // tracks the first SimpleBlock is a raw keyframe the from-scratch
      // VP8 decoder turns into REAL pixels (the MJPEG-in-MP4 analog)
      val info = graft.kernel.Webm.probe(m.payload)
      val vide = info.tracks.find(_.trackType == 1)
      val soun = info.tracks.find(_.trackType == 2)
      val frames = vide.map(_.blockCount.toInt).getOrElse(0)
      val firstVp8 =
        if (vide.exists(_.codecId == "V_VP8"))
          graft.kernel.Webm.firstVideoFrame(m.payload)
            .map(graft.kernel.Vp8.decodeFrame)
        else None
      firstVp8 match {
        case Some(f) =>
          fromDecoded(m, graft.kernel.Media.Decoded(
            vide.map(_.codecId).getOrElse("webm"), f.width, f.height,
            soun.map(_.samplingHz.toInt).getOrElse(0), frames, f.y, 255))
        case None =>
          // V_VP9: the keyframe's uncompressed header is bitstream truth
          // for the dimensions; best-effort (container dims remain the
          // fallback when the first frame is damaged)
          val vp9 =
            if (vide.exists(_.codecId == "V_VP9"))
              graft.kernel.Webm.firstVideoFrame(m.payload).flatMap(f =>
                scala.util.Try(graft.kernel.Vp9.parseKeyframeHeader(f)).toOption)
            else None
          containerRow(m, vide.orElse(soun).map(_.codecId).getOrElse(info.docType),
            vp9.map(_.width).orElse(vide.map(_.width)).getOrElse(0),
            vp9.map(_.height).orElse(vide.map(_.height)).getOrElse(0),
            soun.map(_.samplingHz.toInt).getOrElse(0), frames)
      }
    } else if (graft.kernel.Ogg.isOgg(m.payload)) {
      // Ogg (Opus/Vorbis): page walk + id-header truth; packet decode
      // is the codec-library boundary, stats cover the raw stream
      val info = graft.kernel.Ogg.probe(m.payload)
      containerRow(m, info.codec, 0, 0, info.sampleRate, info.pages.toInt)
    } else if (graft.kernel.Mp3.isMp3(m.payload)) {
      // MPEG audio: exact frame walk (count, rate, duration); subband/
      // huffman decode is the codec-library boundary
      val info = graft.kernel.Mp3.probe(m.payload)
      containerRow(m, "mp3", 0, 0, info.sampleRate, info.frames.toInt)
    } else {
      val magic = new String(m.payload.take(4), java.nio.charset.StandardCharsets.ISO_8859_1)
      val (w, h, rate, frames, dataOff) = magic match {
        case "IMG1" => (be32(m.payload, 4), be32(m.payload, 8), 0, 1, 12)
        case "AUD1" => (0, 0, be32(m.payload, 4), 1, 12)
        case "VID1" => (be32(m.payload, 4), be32(m.payload, 8),
          be32(m.payload, 12), be32(m.payload, 16), 20)
        case other => throw new IllegalArgumentException(s"unknown container '$other'")
      }
      val (mean, hist) = stats(m.payload, dataOff)
      val body = m.payload.length - dataOff
      // stride subsample of the raw body (resize stub for codec formats)
      val tn = math.min(64, body)
      val thumb = Array.tabulate(tn)(i => m.payload(dataOff + (i.toLong * body / tn).toInt))
      val sampled = if (frames <= 1) frames else (frames + 4) / 5
      MediaFeatures(m.media_id, m.kind, magic.toLowerCase, w, h, rate, frames,
        m.payload.length.toLong, mean, hist.toSeq, thumb.toSeq, tn, sampled,
        ok = true, error = "")
    }
  } catch {
    case e: Exception =>
      MediaFeatures(m.media_id, m.kind, "?", 0, 0, 0, 0,
        Option(m.payload).map(_.length.toLong).getOrElse(0L),
        0.0, Seq.fill(8)(0L), Seq.empty, 0, 0,
        ok = false, error = String.valueOf(e.getMessage))
  }

  /** The typed batch stage: binary rows in, feature rows out, one kernel
    * pass per partition (the Scala analog of a `mapInPandas` batch UDF:
    * same schema-in/schema-out contract, iterator-based so payload bytes
    * stream through without materializing the partition).
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeOne))
  }

  // ---------------------------------------------- full video decoding
  final case class VideoFrameRow(media_id: Long, frame_idx: Int,
                                 key_frame: Boolean, width: Int, height: Int,
                                 mean_luma: Double, ok: Boolean, error: String)

  /** Decode EVERY frame of a WebM/VP8 video payload — keyframe plus the
    * motion-compensated interframe tail ([[graft.kernel.Vp8Video]]) —
    * emitting one row per frame with real pixel statistics. This is the
    * video column's analog of the per-image decode: frame sampling,
    * per-frame quality stats and frame-level perceptual hashing all
    * start from this row shape. Non-WebM / non-VP8 payloads come back
    * as a single `ok=false` row (C5).
    */
  def videoFrameOne(m: Media): Seq[VideoFrameRow] = try {
    require(graft.kernel.Webm.isWebm(m.payload), "not a WebM container")
    val frames = graft.kernel.Webm.videoFrames(m.payload)
    require(frames.nonEmpty, "no video track blocks")
    val decoded = graft.kernel.Vp8Video.decodeSequenceFrames(frames)
    decoded.zipWithIndex.map { case (sf, i) =>
      val f = sf.frame
      var sum = 0L
      var k = 0
      while (k < f.y.length) { sum += f.y(k); k += 1 }
      val mean = math.rint(sum.toDouble / math.max(1, f.y.length) * 10000) / 10000
      VideoFrameRow(m.media_id, i, sf.keyFrame,
        f.width, f.height, mean, ok = true, error = "")
    }
  } catch {
    case e: Exception =>
      Seq(VideoFrameRow(m.media_id, -1, key_frame = false, 0, 0, 0.0,
        ok = false, error = String.valueOf(e.getMessage)))
  }

  /** Typed batch stage: media rows in, one row per decoded frame out. */
  def videoFrames(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(videoFrameOne)).toDF()
  }

  // ------------------------------------------- perceptual image dedup
  final case class ImageHashRow(media_id: Long, codec: String, width: Int,
                                height: Int, dhash: Long, phash: Long,
                                ok: Boolean, error: String)

  /** Perceptual hashes per payload ([[graft.kernel.ImageHash]]): dHash
    * (gradient) + pHash (DCT) over the decoded luminance plane. Every
    * format with a real from-scratch pixel decode participates (BMP,
    * PNG, JPEG, GIF, TIFF, WebP incl. lossy VP8, and AVI's first MJPEG
    * frame); non-image payloads in a mixed media column come back
    * `ok=false` with a reason instead of poisoning the stage (C5).
    */
  def imageHashOne(m: Media): ImageHashRow = try {
    val p = m.payload
    val d =
      if (graft.kernel.Media.isBmp(p)) graft.kernel.Media.decodeBmp(p)
      else if (graft.kernel.Media.isPng(p)) graft.kernel.Media.decodePng(p)
      else if (graft.kernel.Jpeg.isJpeg(p)) graft.kernel.Jpeg.decode(p)
      else if (graft.kernel.Media.isGif(p)) graft.kernel.Media.decodeGif(p)
      else if (graft.kernel.Media.isTiff(p)) graft.kernel.Media.decodeTiff(p)
      else if (graft.kernel.WebP.isWebP(p)) graft.kernel.WebP.decode(p)
      else if (graft.kernel.Media.isAvi(p)) graft.kernel.Media.decodeAvi(p)
      else throw new IllegalArgumentException("no still-image decoder for payload")
    require(d.width > 0 && d.height > 0, s"no pixel plane in ${d.codec}")
    // EXIF orientation normalization: a phone photo and its upright
    // re-encode must hash IDENTICALLY — hash the display-space pixels
    val (px, pw, ph) =
      if (graft.kernel.Jpeg.isJpeg(p))
        graft.kernel.Exif.upright(d.samples, d.width, d.height,
          graft.kernel.Exif.fromJpeg(p).orientation)
      else (d.samples, d.width, d.height)
    ImageHashRow(m.media_id, d.codec, pw, ph,
      graft.kernel.ImageHash.dHash64(px, pw, ph),
      graft.kernel.ImageHash.pHash64(px, pw, ph),
      ok = true, error = "")
  } catch {
    case e: Exception =>
      ImageHashRow(m.media_id, "?", 0, 0, 0L, 0L, ok = false,
        String.valueOf(e.getMessage))
  }

  /** Typed batch stage: media rows in, perceptual-hash rows out. */
  def imageHashes(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(imageHashOne)).toDF()
  }

  /** Image near-dup clusters — the LAION-style re-encode dedup: dHash
    * per image, identical hashes collapsed, multi-index Hamming join +
    * connected components ([[Dedup.hammingClusters]] — exact recall at
    * the given radius, shuffle-shaped). Returns
    * `(media_id, cluster, keep)` for every DECODABLE image;
    * undecodable rows are excluded (they have no pixels to compare).
    * `keep` marks the cluster's canonical representative (minimum id).
    */
  def imageDedup(media: Dataset[Media], maxHamming: Int = 8): DataFrame = {
    val hashes = imageHashes(media).where(col("ok"))
    Dedup.hammingClusters(hashes, "media_id", "dhash", maxHamming)
      .select(col("id").as("media_id"), col("cluster"),
        (col("id") === col("cluster")).as("keep"))
  }

  /** Per-kind feature rollup (bytes, levels, failure counts). */
  /** Embedded images of a PDF corpus — one row per image XObject:
    * `(id, page_idx, name, width, height, codec, mean_luma, n_black,
    * n_pixels)`. The scanned-document path: a scanner PDF is a G4 or
    * DCT full-page image with no text operators, and THIS is where its
    * payload surfaces ([[graft.kernel.Pdf.pageImages]]: CCITT G4
    * decoded from scratch, DCT routed through the [[graft.kernel.Jpeg]]
    * kernel). Stateless per-row flatMap, C5-isolated per document.
    */
  def pdfImages(df: DataFrame, idCol: String, pdfCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(idCol).cast("string"),
      org.apache.spark.sql.functions.col(pdfCol).cast("binary"))
      .as[(String, Array[Byte])]
      .flatMap { case (id, pdf) =>
        if (pdf == null) Iterator.empty
        else scala.util.Try {
          val doc = graft.kernel.Pdf.parseDoc(pdf)
          graft.kernel.Pdf.pageImages(doc)
        }.getOrElse(Vector.empty).iterator.map { im =>
          val (mean, nBlack, nPx) = im.codec match {
            case "gray" =>
              var sum = 0L; var black = 0L
              im.data.foreach { b =>
                val v = b & 0xff
                sum += v
                if (v < 128) black += 1
              }
              (sum.toDouble / math.max(1, im.data.length), black, im.data.length.toLong)
            case "jpeg" =>
              scala.util.Try(graft.kernel.Jpeg.decode(im.data)).toOption match {
                case Some(d) =>
                  var sum = 0L; var black = 0L
                  d.samples.foreach { v => sum += v; if (v < 128) black += 1 }
                  (sum.toDouble / math.max(1, d.samples.length), black,
                    d.samples.length.toLong)
                case None => (-1.0, -1L, -1L)
              }
            case _ => (-1.0, -1L, -1L)
          }
          (id, im.pageIdx, im.name, im.width, im.height, im.codec,
            math.rint(mean * 100) / 100, nBlack, nPx)
        }
      }.toDF(idCol, "page_idx", "name", "width", "height", "codec",
        "mean_luma", "n_black", "n_pixels")
  }

  def featureStats(features: DataFrame): DataFrame =
    features.groupBy(col("kind")).agg(
      count(lit(1)).as("n"),
      sum(col("n_bytes")).as("total_bytes"),
      round(avg(col("mean_level")), 4).as("avg_level"),
      sum(col("sampled_frames")).as("frames_sampled"),
      sum((!col("ok")).cast("long")).as("failed"))
}
