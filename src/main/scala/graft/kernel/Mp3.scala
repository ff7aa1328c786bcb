package graft.kernel

/** MPEG audio (MP3) frame-header walk — the crawl audio column's most
  * common format. Parses the ID3v2 prefix (syncsafe length skip), then
  * every MPEG frame header per ISO/IEC 11172-3 §2.4.1.3 / 13818-3:
  * version (1 / 2 / 2.5), layer (I–III), bitrate and sampling-rate
  * table lookups, padding, channel mode — walking frame-by-frame via
  * the computed frame lengths to an exact frame count, VBR detection
  * (bitrate varies across frames) and a sample-exact duration. Audio
  * DECODE (subband synthesis / huffman) stays behind the codec-library
  * boundary like H.264; every declarative header field is real.
  */
object Mp3 {

  final case class Mp3Info(version: String, layer: Int, bitrateKbps: Int,
                           sampleRate: Int, channels: Int, frames: Long,
                           durationMs: Long, vbr: Boolean, id3Bytes: Int)

  /** bitrate kbps tables, indexed [versionGroup][layerIdx][bitrateIdx];
    * versionGroup 0 = MPEG1, 1 = MPEG2/2.5 (11172-3 table B.2 /
    * 13818-3). Index 0 = "free", 15 = forbidden.
    */
  private val Bitrates: Array[Array[Array[Int]]] = Array(
    Array( // MPEG1: layer I, II, III
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, -1),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, -1),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)),
    Array( // MPEG2/2.5
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, -1),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)))

  private val RatesV1 = Array(44100, 48000, 32000, -1)

  def isMp3(p: Array[Byte]): Boolean =
    hasId3(p) || (p.length >= 4 && syncAt(p, 0))

  private def hasId3(p: Array[Byte]): Boolean =
    p.length >= 10 && p(0) == 'I' && p(1) == 'D' && p(2) == '3'

  private def syncAt(p: Array[Byte], o: Int): Boolean =
    o + 4 <= p.length && (p(o) & 0xff) == 0xff && (p(o + 1) & 0xe0) == 0xe0 &&
      ((p(o + 1) >> 3) & 3) != 1 && // version reserved
      ((p(o + 1) >> 1) & 3) != 0 && // layer reserved
      ((p(o + 2) >> 4) & 0xf) != 15 && // bitrate forbidden
      ((p(o + 2) >> 2) & 3) != 3 // sample rate reserved

  /** One frame header at `o` → (lengthBytes, bitrateKbps, sampleRate,
    * channels, samplesPerFrame, version, layer).
    */
  private def frame(p: Array[Byte], o: Int)
      : (Int, Int, Int, Int, Int, String, Int) = {
    require(syncAt(p, o), "lost frame sync")
    val vBits = (p(o + 1) >> 3) & 3 // 0=2.5, 2=2, 3=1
    val layer = 4 - ((p(o + 1) >> 1) & 3) // 1..3
    val brIdx = (p(o + 2) >> 4) & 0xf
    val srIdx = (p(o + 2) >> 2) & 3
    val padding = (p(o + 2) >> 1) & 1
    val mono = ((p(o + 3) >> 6) & 3) == 3
    val vGroup = if (vBits == 3) 0 else 1
    val br = Bitrates(vGroup)(layer - 1)(brIdx)
    require(br > 0, "free-format bitrate unsupported")
    val sr = vBits match {
      case 3 => RatesV1(srIdx)
      case 2 => RatesV1(srIdx) / 2
      case 0 => RatesV1(srIdx) / 4
      case _ => -1
    }
    require(sr > 0, "reserved sample rate")
    val spf =
      if (layer == 1) 384
      else if (layer == 2) 1152
      else if (vGroup == 0) 1152 else 576
    val len =
      if (layer == 1) (12 * br * 1000 / sr + padding) * 4
      else spf / 8 * br * 1000 / sr + padding
    val version = vBits match {
      case 3 => "1"; case 2 => "2"; case _ => "2.5"
    }
    (len, br, sr, if (mono) 1 else 2, spf, version, layer)
  }

  def probe(p: Array[Byte]): Mp3Info = {
    require(isMp3(p), "not MPEG audio")
    var o = 0
    var id3 = 0
    if (hasId3(p)) {
      // ID3v2 length is syncsafe (7 bits per byte), header is 10 bytes
      id3 = 10 + (((p(6) & 0x7f) << 21) | ((p(7) & 0x7f) << 14) |
        ((p(8) & 0x7f) << 7) | (p(9) & 0x7f))
      require(id3 <= p.length, "ID3 tag overruns file")
      o = id3
    }
    require(syncAt(p, o), "no MPEG frame after ID3 tag")
    val (_, br0, sr0, ch0, _, ver0, layer0) = frame(p, o)
    var frames = 0L
    var samples = 0L
    var vbr = false
    while (o + 4 <= p.length && syncAt(p, o)) {
      val (len, br, sr, _, spf, _, _) = frame(p, o)
      require(sr == sr0, "sample-rate change mid-stream")
      if (br != br0) vbr = true
      // a frame truncated by EOF still counts (players decode it)
      frames += 1
      samples += spf
      o += len
    }
    // trailing non-sync bytes are tolerated (ID3v1 'TAG' tails etc.)
    Mp3Info(ver0, layer0, br0, sr0, ch0, frames,
      samples * 1000L / sr0, vbr, id3)
  }
}
