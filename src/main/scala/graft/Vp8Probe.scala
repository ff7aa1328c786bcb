package graft

/** Dev diagnostic: decode libwebp-encoded VP8 streams and compare
  * byte-exactly with libwebp's own YUV decode (dumped beside each
  * .webp). Not part of the driver contract.
  */
object Vp8Probe {
  def main(args: Array[String]): Unit = {
    val names = Seq("grad", "flat", "blocks", "noise", "sine", "chroma", "odd", "parts", "seg", "q10", "f60", "f100s3", "fsimple", "fseg", "fq10", "fsharp7", "fchroma")
    var pass = 0
    names.foreach { name =>
      try {
        val webp = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"/tmp/vp8_$name.webp"))
        val ref = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(s"/tmp/vp8_$name.yuv"))
        val bb = java.nio.ByteBuffer.wrap(ref).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val w = bb.getInt; val h = bb.getInt; val ul = bb.getInt; val vl = bb.getInt
        val refY = new Array[Int](w * h); var i = 0
        while (i < w * h) { refY(i) = bb.get() & 0xff; i += 1 }
        val refU = new Array[Int](ul); i = 0
        while (i < ul) { refU(i) = bb.get() & 0xff; i += 1 }
        val refV = new Array[Int](vl); i = 0
        while (i < vl) { refV(i) = bb.get() & 0xff; i += 1 }
        // find 'VP8 ' chunk in RIFF
        var off = 12; var payload: Array[Byte] = null
        while (payload == null && off + 8 <= webp.length) {
          val fourcc = new String(webp.slice(off, off + 4), "ISO-8859-1")
          val sz = (webp(off+4)&0xff) | ((webp(off+5)&0xff)<<8) | ((webp(off+6)&0xff)<<16) | ((webp(off+7)&0xff)<<24)
          if (fourcc == "VP8 ") payload = webp.slice(off + 8, off + 8 + sz)
          else off += 8 + sz + (sz & 1)
        }
        require(payload != null, "no VP8 chunk")
        val f = graft.kernel.Vp8.decodeFrame(payload)
        require(f.width == w && f.height == h, s"dims ${f.width}x${f.height} vs ${w}x$h")
        def diff(a: Array[Int], b: Array[Int]): (Int, Int) = {
          var n = 0; var mx = 0; var k = 0
          while (k < a.length) { val d0 = math.abs(a(k) - b(k)); if (d0 > 0) n += 1; if (d0 > mx) mx = d0; k += 1 }
          (n, mx)
        }
        val (ny, my) = diff(f.y, refY)
        val (nu, mu) = diff(f.u, refU)
        val (nv, mv) = diff(f.v, refV)
        val ok = ny + nu + nv == 0
        if (ok) pass += 1
        println(f"VP8PROBE $name%-8s filtered=${f.filtered}%-5s ydiff=$ny%6d(max $my%3d) udiff=$nu%5d(max $mu%3d) vdiff=$nv%5d(max $mv%3d) ${if (ok) "EXACT" else "DIFF"}")
      } catch {
        case e: Exception => println(s"VP8PROBE $name FAILED: ${e.getMessage}")
      }
    }
    println(s"VP8PROBE $pass/${names.length} exact")
  }
}
