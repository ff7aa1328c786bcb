package graft.kernel

/** Ogg container walk (RFC 3533) with Opus (RFC 7845) and Vorbis
  * identification-header parsing — the crawl audio column's
  * open-codec half next to [[Mp3]]. Pages are walked via the lacing
  * tables; the BOS page's first packet identifies the codec
  * ("OpusHead" / 0x01+"vorbis"), and the LAST page's granule position
  * gives the sample-exact stream length (Opus granules are 48 kHz
  * samples less pre-skip; Vorbis granules are native-rate samples).
  * Packet DECODE stays behind the codec-library boundary; page CRCs
  * are not verified (a probe reads structure, not integrity).
  */
object Ogg {

  final case class OggInfo(codec: String, channels: Int, sampleRate: Int,
                           preSkip: Int, pages: Long, durationMs: Long)

  def isOgg(p: Array[Byte]): Boolean =
    p.length >= 4 && p(0) == 'O' && p(1) == 'g' && p(2) == 'g' && p(3) == 'S'

  private def le32(p: Array[Byte], o: Int): Int =
    (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
  private def le64(p: Array[Byte], o: Int): Long =
    (le32(p, o).toLong & 0xffffffffL) | (le32(p, o + 4).toLong << 32)

  /** (granule, payloadStart, payloadEnd, nextPageOffset) of the page
    * at `o`. Bounds-checked; bad capture/version throws.
    */
  private def page(p: Array[Byte], o: Int): (Long, Int, Int, Int) = {
    require(o + 27 <= p.length && p(o) == 'O' && p(o + 1) == 'g' &&
      p(o + 2) == 'g' && p(o + 3) == 'S', "bad Ogg capture pattern")
    require(p(o + 4) == 0, s"Ogg version ${p(o + 4)}")
    val granule = le64(p, o + 6)
    val nSegs = p(o + 26) & 0xff
    require(o + 27 + nSegs <= p.length, "truncated segment table")
    var payload = 0
    var i = 0
    while (i < nSegs) { payload += p(o + 27 + i) & 0xff; i += 1 }
    val body = o + 27 + nSegs
    require(body + payload <= p.length, "page payload overruns file")
    (granule, body, body + payload, body + payload)
  }

  def probe(p: Array[Byte]): OggInfo = {
    require(isOgg(p), "not an Ogg stream")
    val (_, b0, e0, after0) = page(p, 0)
    require((p(5) & 0x02) != 0, "first page is not BOS")
    val (codec, channels, rate, preSkip) =
      if (e0 - b0 >= 19 && new String(p, b0, 8,
        java.nio.charset.StandardCharsets.ISO_8859_1) == "OpusHead") {
        // RFC 7845 §5.1: version(1) channels(1) preskip(LE16) rate(LE32)
        val ch = p(b0 + 9) & 0xff
        val skip = (p(b0 + 10) & 0xff) | ((p(b0 + 11) & 0xff) << 8)
        (("opus"), ch, le32(p, b0 + 12), skip)
      } else if (e0 - b0 >= 30 && p(b0) == 1 && new String(p, b0 + 1, 6,
        java.nio.charset.StandardCharsets.ISO_8859_1) == "vorbis") {
        // Vorbis I §4.2.2: version(LE32) channels(1) rate(LE32)
        (("vorbis"), p(b0 + 11) & 0xff, le32(p, b0 + 12), 0)
      } else throw new IllegalArgumentException("unknown Ogg codec id header")
    require(channels > 0 && rate > 0, "bad channel count / sample rate")
    var o = after0
    var pages = 1L
    var lastGranule = 0L
    while (o + 27 <= p.length) {
      val (g, _, _, next) = page(p, o)
      if (g >= 0) lastGranule = g // -1 marks a continued-packet-only page
      pages += 1
      o = next
    }
    require(o == p.length, s"trailing bytes after last page at $o")
    val durMs = codec match {
      // Opus granules tick at 48 kHz regardless of input rate (RFC 7845 §4)
      case "opus" => math.max(0L, lastGranule - preSkip) * 1000L / 48000L
      case _      => lastGranule * 1000L / rate
    }
    OggInfo(codec, channels, rate, preSkip, pages, durMs)
  }
}
