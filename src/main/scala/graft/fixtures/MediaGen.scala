package graft.fixtures

import graft.ops.Multimodal.Media
import scala.util.Random

/** Deterministic media-payload generator for the multimodal operators.
  * Emits a mix of REAL standard formats (decoded for real by
  * [[graft.kernel.Media]]) and the stub container (the stand-in for
  * codec-library formats, parsed by [[graft.ops.Multimodal.decodeOne]]):
  *
  *  real:  BMP (24 bpp BI_RGB, padded bottom-up rows), WAV (RIFF PCM
  *         16-bit mono), PNG (8-bit grey/RGB, rows forward-filtered
  *         cycling all five PNG filter types, zlib via JDK `Deflater`)
  *  stub:  `IMG1` + be32(w) + be32(h) + pixel bytes
  *         `AUD1` + be32(rate) + be32(n) + sample bytes
  *         `VID1` + be32(w) + be32(h) + be32(fps) + be32(frames) + bytes
  *
  * Seeded, no wall-clock — same (n, seed) always yields identical bytes.
  */
object MediaGen {

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def body(r: Random, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  /** 24 bpp uncompressed BMP (bottom-up, 4-byte-padded rows). */
  def bmp(pixelsTopDown: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixelsTopDown.length == w * h * 3)
    val rowBytes = ((24 * w + 31) / 32) * 4
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(54 + rowBytes * h)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h)) // positive h = bottom-up
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(le32(rowBytes * h)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    val row = new Array[Byte](rowBytes)
    var y = h - 1
    while (y >= 0) { // file order is bottom row first
      java.util.Arrays.fill(row, 0.toByte)
      System.arraycopy(pixelsTopDown, y * w * 3, row, 0, w * 3)
      out.write(row)
      y -= 1
    }
    out.toByteArray
  }

  /** RIFF/WAVE PCM, 16-bit mono. */
  def wav(samples: Array[Short], rate: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(le32(36 + samples.length * 2))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(16)); out.write(le16(1))
    out.write(le16(1)); out.write(le32(rate)); out.write(le32(rate * 2))
    out.write(le16(2)); out.write(le16(16))
    out.write("data".getBytes); out.write(le32(samples.length * 2))
    samples.foreach(s => out.write(le16(s & 0xffff)))
    out.toByteArray
  }

  /** PNG, 8-bit depth, `channels` ∈ {1 grey, 3 RGB}; row `y` is
    * forward-filtered with filter type `y % 5`, so a decoder must
    * implement all five reconstruction filters to get the pixels back.
    */
  def png(img: Array[Byte], w: Int, h: Int, channels: Int): Array[Byte] = {
    require(img.length == w * h * channels && (channels == 1 || channels == 3))
    val stride = w * channels
    def paeth(a: Int, b: Int, c: Int): Int = {
      val pp = a + b - c
      val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte]((1 + stride) * h)
    var y = 0
    while (y < h) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = img(y * stride + x) & 0xff
        val a = if (x >= channels) img(y * stride + x - channels) & 0xff else 0
        val b = if (y > 0) img((y - 1) * stride + x) & 0xff else 0
        val c = if (y > 0 && x >= channels) img((y - 1) * stride + x - channels) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = ((cur - pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val idat = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes); crc.update(data)
      be32(data.length) ++ typ.getBytes ++ data ++ be32(crc.getValue.toInt)
    }
    val colorType = if (channels == 1) 0 else 2
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat.toByteArray) ++ chunk("IEND", Array.empty)
  }

  def media(n: Int, seed: Long = 42L): IndexedSeq[Media] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val host = r.nextInt(20)
      r.nextInt(6) match {
        case 0 =>
          val w = 8 + r.nextInt(56); val h = 8 + r.nextInt(40)
          Media(i.toLong, s"https://host$host.example.com/img/$i", "image",
            "IMG1".getBytes ++ be32(w) ++ be32(h) ++ body(r, w * h))
        case 1 =>
          val rate = 8000 + 4000 * r.nextInt(3); val ns = 256 + r.nextInt(1024)
          Media(i.toLong, s"https://host$host.example.com/aud/$i", "audio",
            "AUD1".getBytes ++ be32(rate) ++ be32(ns) ++ body(r, ns))
        case 2 =>
          val w = 8 + r.nextInt(24); val h = 8 + r.nextInt(16)
          val fps = 10 + r.nextInt(20); val frames = 1 + r.nextInt(30)
          Media(i.toLong, s"https://host$host.example.com/vid/$i", "video",
            "VID1".getBytes ++ be32(w) ++ be32(h) ++ be32(fps) ++ be32(frames) ++
              body(r, math.min(w * h * frames, 4096)))
        case 3 =>
          val w = 4 + r.nextInt(28); val h = 4 + r.nextInt(20)
          Media(i.toLong, s"https://host$host.example.com/img/$i.bmp", "image",
            bmp(body(r, w * h * 3), w, h))
        case 4 =>
          val rate = 8000 + 4000 * r.nextInt(3); val ns = 64 + r.nextInt(512)
          val samples = Array.tabulate(ns)(_ => r.nextInt(65536).toShort)
          Media(i.toLong, s"https://host$host.example.com/aud/$i.wav", "audio",
            wav(samples, rate))
        case _ =>
          val ch = if (r.nextBoolean()) 1 else 3
          val w = 4 + r.nextInt(28); val h = 4 + r.nextInt(20)
          Media(i.toLong, s"https://host$host.example.com/img/$i.png", "image",
            png(body(r, w * h * ch), w, h, ch))
      }
    }
  }
}
