package graft.kernel

/** Matroska/WebM container walk (EBML, RFC 8794; Matroska element IDs
  * per the public Matroska spec) — the other half of the crawl's video
  * column next to [[Media.probeMp4]]. Parses the EBML header (DocType),
  * Segment → Info (timecode scale, duration), Tracks (type, codec id,
  * video dimensions, audio sampling rate) and Clusters (per-track block
  * counts, first-keyframe extraction). For `V_VP8` tracks the first
  * SimpleBlock payload is a raw VP8 keyframe this engine decodes from
  * scratch ([[Vp8.decodeFrame]]) — real pixels out of a real crawl
  * video container with zero codec libraries; `V_VP9`/`A_OPUS`/… stay
  * container-metadata-only (the documented codec-library boundary).
  *
  * EBML grammar: every element is `vint id | vint size | body`. IDs
  * keep their length-marker bits (the spec writes them as full bytes);
  * sizes strip the marker, and an all-ones size means "unknown —
  * extends to the end of the enclosing scope" (legal for Segment and
  * Cluster in streamed files; handled as parent-end here). All reads
  * are bounds-checked; malformed input throws (C5: caller isolates per
  * row).
  */
object Webm {

  def isWebm(p: Array[Byte]): Boolean =
    p.length >= 4 && (p(0) & 0xff) == 0x1a && (p(1) & 0xff) == 0x45 &&
      (p(2) & 0xff) == 0xdf && (p(3) & 0xff) == 0xa3

  // Matroska element IDs (marker bits included, as written on the wire)
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimecodeScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackNumber = 0xd7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL
  private val IdAudio = 0xe1L
  private val IdSamplingFrequency = 0xb5L
  private val IdCluster = 0x1f43b675L
  private val IdSimpleBlock = 0xa3L
  private val IdBlockGroup = 0xa0L
  private val IdBlock = 0xa1L

  final case class WebmTrack(number: Long, trackType: Int, codecId: String,
                             width: Int, height: Int, samplingHz: Double,
                             blockCount: Long)
  final case class WebmInfo(docType: String, timecodeScaleNs: Long,
                            durationMs: Double, tracks: Vector[WebmTrack])

  /** vint length from the first byte (number of leading zero bits + 1). */
  private def vintLen(first: Int): Int = {
    require(first != 0, "vint with >8-byte length")
    Integer.numberOfLeadingZeros(first) - 24 + 1
  }

  /** Read a vint at `off`; `stripMarker` for sizes, kept for IDs.
    * Returns (value, bytesRead); value −1 encodes the all-ones
    * "unknown size" (only meaningful with stripMarker).
    */
  private def vint(p: Array[Byte], off: Int, end: Int,
                   stripMarker: Boolean): (Long, Int) = {
    require(off < end, "truncated vint")
    val first = p(off) & 0xff
    val len = vintLen(first)
    require(off + len <= end, "vint overruns scope")
    var v = if (stripMarker) (first & ((1 << (8 - len)) - 1)).toLong else first.toLong
    var allOnes = stripMarker && v == ((1 << (8 - len)) - 1).toLong
    var i = 1
    while (i < len) {
      val b = p(off + i) & 0xff
      if (b != 0xff) allOnes = false
      v = (v << 8) | b
      i += 1
    }
    (if (allOnes) -1L else v, len)
  }

  /** Direct children of [start, end): (id, bodyStart, bodyEnd) triples.
    * Unknown-size elements run to the end of the scope (and are
    * necessarily last).
    */
  private def children(p: Array[Byte], start: Int, end: Int)
      : Vector[(Long, Int, Int)] = {
    val out = Vector.newBuilder[(Long, Int, Int)]
    var off = start
    while (off < end) {
      val (id, idLen) = vint(p, off, end, stripMarker = false)
      val (size, szLen) = vint(p, off + idLen, end, stripMarker = true)
      val bodyStart = off + idLen + szLen
      val bodyEnd =
        if (size < 0) end
        else {
          require(size <= end - bodyStart, s"element 0x${id.toHexString} overruns scope")
          bodyStart + size.toInt
        }
      out += ((id, bodyStart, bodyEnd))
      off = bodyEnd
    }
    out.result()
  }

  private def uint(p: Array[Byte], b: Int, e: Int): Long = {
    require(e - b <= 8, "uint over 8 bytes")
    var v = 0L
    var i = b
    while (i < e) { v = (v << 8) | (p(i) & 0xff); i += 1 }
    v
  }
  private def float(p: Array[Byte], b: Int, e: Int): Double = (e - b) match {
    case 4 => java.lang.Float.intBitsToFloat(uint(p, b, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(p, b, e))
    case n => throw new IllegalArgumentException(s"float element of $n bytes")
  }
  private def str(p: Array[Byte], b: Int, e: Int): String =
    new String(p, b, e - b, java.nio.charset.StandardCharsets.ISO_8859_1)

  private def find(cs: Vector[(Long, Int, Int)], id: Long): Option[(Int, Int)] =
    cs.collectFirst { case (i, b, e) if i == id => (b, e) }

  /** Block/SimpleBlock body → (trackNumber, payloadStart). Lacing is
    * counted as one block (frame-accurate lace expansion is a player
    * concern, not a probe's).
    */
  private def blockTrack(p: Array[Byte], b: Int, e: Int): (Long, Int) = {
    val (track, tLen) = vint(p, b, e, stripMarker = true)
    require(b + tLen + 3 <= e, "truncated block header")
    (track, b + tLen + 3) // int16 timecode + flags byte
  }

  def probe(p: Array[Byte]): WebmInfo = {
    require(isWebm(p), "not EBML/WebM")
    val top = children(p, 0, p.length)
    val docType = find(top, IdEbml).flatMap { case (b, e) =>
      find(children(p, b, e), IdDocType).map { case (db, de) => str(p, db, de) }
    }.getOrElse("")
    val (segB, segE) = find(top, IdSegment)
      .getOrElse(throw new IllegalArgumentException("no Segment"))
    val seg = children(p, segB, segE)
    val tcScale = find(seg, IdInfo).flatMap { case (b, e) =>
      find(children(p, b, e), IdTimecodeScale).map { case (tb, te) => uint(p, tb, te) }
    }.getOrElse(1000000L)
    val durTicks = find(seg, IdInfo).flatMap { case (b, e) =>
      find(children(p, b, e), IdDuration).map { case (db, de) => float(p, db, de) }
    }.getOrElse(0.0)
    val entries = find(seg, IdTracks).map { case (b, e) =>
      children(p, b, e).collect { case (IdTrackEntry, tb, te) =>
        val t = children(p, tb, te)
        val number = find(t, IdTrackNumber).map { case (nb, ne) => uint(p, nb, ne) }.getOrElse(0L)
        val ttype = find(t, IdTrackType).map { case (nb, ne) => uint(p, nb, ne).toInt }.getOrElse(0)
        val codec = find(t, IdCodecId).map { case (cb, ce) => str(p, cb, ce) }.getOrElse("")
        val (w, h) = find(t, IdVideo).map { case (vb, ve) =>
          val v = children(p, vb, ve)
          (find(v, IdPixelWidth).map { case (x, y) => uint(p, x, y).toInt }.getOrElse(0),
            find(v, IdPixelHeight).map { case (x, y) => uint(p, x, y).toInt }.getOrElse(0))
        }.getOrElse((0, 0))
        val hz = find(t, IdAudio).flatMap { case (ab, ae) =>
          find(children(p, ab, ae), IdSamplingFrequency)
            .map { case (x, y) => float(p, x, y) }
        }.getOrElse(0.0)
        (number, ttype, codec, w, h, hz)
      }
    }.getOrElse(Vector.empty)
    // per-track block counts over every cluster
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    seg.foreach {
      case (IdCluster, cb, ce) =>
        children(p, cb, ce).foreach {
          case (IdSimpleBlock, bb, be) =>
            val (tn, _) = blockTrack(p, bb, be)
            counts(tn) = counts.getOrElse(tn, 0L) + 1L
          case (IdBlockGroup, gb, ge) =>
            find(children(p, gb, ge), IdBlock).foreach { case (bb, be) =>
              val (tn, _) = blockTrack(p, bb, be)
              counts(tn) = counts.getOrElse(tn, 0L) + 1L
            }
          case _ => ()
        }
      case _ => ()
    }
    WebmInfo(docType, tcScale, durTicks * tcScale / 1e6,
      entries.map { case (n, tt, c, w, h, hz) =>
        WebmTrack(n, tt, c, w, h, hz, counts.getOrElse(n, 0L))
      })
  }

  /** Payload bytes of the FIRST block of the first video track (track
    * type 1) — for `V_VP8` this is a raw keyframe [[Vp8.decodeFrame]]
    * accepts. `None` when there is no video track or no cluster.
    */
  /** ALL of the video track's SimpleBlock payloads in stream order —
    * the full frame sequence [[Vp8Video.decodeSequence]] consumes
    * (keyframe + interframes), where [[firstVideoFrame]] stops at the
    * first.
    */
  def videoFrames(p: Array[Byte]): Vector[Array[Byte]] = {
    require(isWebm(p), "not EBML/WebM")
    val top = children(p, 0, p.length)
    val (segB, segE) = find(top, IdSegment)
      .getOrElse(throw new IllegalArgumentException("no Segment"))
    val seg = children(p, segB, segE)
    val videoTrack = find(seg, IdTracks).flatMap { case (b, e) =>
      children(p, b, e).collectFirst {
        case (IdTrackEntry, tb, te)
          if find(children(p, tb, te), IdTrackType)
            .exists { case (x, y) => uint(p, x, y) == 1L } =>
          find(children(p, tb, te), IdTrackNumber)
            .map { case (x, y) => uint(p, x, y) }.getOrElse(0L)
      }
    }.getOrElse(return Vector.empty)
    seg.iterator.collect { case (IdCluster, cb, ce) => (cb, ce) }
      .flatMap { case (cb, ce) =>
        children(p, cb, ce).iterator.collect { case (IdSimpleBlock, bb, be) => (bb, be) }
      }
      .map { case (bb, be) => (blockTrack(p, bb, be), be) }
      .collect { case ((tn, payloadStart), be) if tn == videoTrack =>
        java.util.Arrays.copyOfRange(p, payloadStart, be)
      }
      .toVector
  }

  def firstVideoFrame(p: Array[Byte]): Option[Array[Byte]] = {
    require(isWebm(p), "not EBML/WebM")
    val top = children(p, 0, p.length)
    val (segB, segE) = find(top, IdSegment)
      .getOrElse(throw new IllegalArgumentException("no Segment"))
    val seg = children(p, segB, segE)
    val videoTrack = find(seg, IdTracks).flatMap { case (b, e) =>
      children(p, b, e).collectFirst {
        case (IdTrackEntry, tb, te)
          if find(children(p, tb, te), IdTrackType)
            .exists { case (x, y) => uint(p, x, y) == 1L } =>
          find(children(p, tb, te), IdTrackNumber)
            .map { case (x, y) => uint(p, x, y) }.getOrElse(0L)
      }
    }.getOrElse(return None)
    seg.iterator.collect { case (IdCluster, cb, ce) => (cb, ce) }
      .flatMap { case (cb, ce) =>
        children(p, cb, ce).iterator.collect { case (IdSimpleBlock, bb, be) => (bb, be) }
      }
      .map { case (bb, be) => (blockTrack(p, bb, be), be) }
      .collectFirst { case ((tn, payloadStart), be) if tn == videoTrack =>
        java.util.Arrays.copyOfRange(p, payloadStart, be)
      }
  }
}
