package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.{Exif, Jpeg, ImageHash}
import graft.fixtures.MediaGen

class ExifSpec extends AnyFunSuite {

  test("APP1 Exif parses: orientation, make, DateTimeOriginal via the sub-IFD") {
    val luma = Array.tabulate(24 * 16)(i => (i * 11) % 256)
    val bytes = MediaGen.jpeg(luma, 24, 16, exifOrientation = 6,
      exifMake = "GraftCam", exifDateTime = "2024:05:01 10:20:30")
    val m = Exif.fromJpeg(bytes)
    assert(m.orientation === 6)
    assert(m.make === "GraftCam")
    assert(m.dateTime === "2024:05:01 10:20:30")
    // the segment must not disturb pixel decoding
    val d = Jpeg.decode(bytes)
    assert((d.width, d.height) === ((24, 16)))
    // no EXIF -> defaults; non-JPEG -> defaults; truncated APP1 -> defaults
    assert(Exif.fromJpeg(MediaGen.jpeg(luma, 24, 16)) === Exif.Empty)
    assert(Exif.fromJpeg("nope".getBytes) === Exif.Empty)
    assert(Exif.fromJpeg(bytes.take(10)) === Exif.Empty)
    // JDK agreement: ImageIO reads the file fine with the segment present
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth === 24)
  }

  test("upright: all eight orientations invert correctly (applying them to their inverse restores)") {
    val (w, h) = (5, 3)
    val src = Array.tabulate(w * h)(identity)
    // orientation o stores a transformed image; upright() must recover
    // display space. Round-trip check: store(src, o) then upright == src,
    // where store is the mathematical inverse of upright.
    def storeFor(o: Int): (Array[Int], Int, Int) = {
      val swap = o >= 5
      val (sw, sh) = if (swap) (h, w) else (w, h)
      val st = new Array[Int](w * h)
      // build stored s.t. upright(stored) == src: invert the mapping
      var y = 0
      while (y < sh) {
        var x = 0
        while (x < sw) {
          // upright maps stored(x,y) -> display(nx,ny); so stored(x,y) =
          // src(nx,ny) with (nx,ny) per the same formulas
          val (nx, ny) = o match {
            case 1 => (x, y)
            case 2 => (sw - 1 - x, y)
            case 3 => (sw - 1 - x, sh - 1 - y)
            case 4 => (x, sh - 1 - y)
            case 5 => (y, x)
            case 6 => (sh - 1 - y, x)
            case 7 => (sh - 1 - y, sw - 1 - x)
            case _ => (y, sw - 1 - x)
          }
          st(y * sw + x) = src(ny * w + nx)
          x += 1
        }
        y += 1
      }
      (st, sw, sh)
    }
    (1 to 8).foreach { o =>
      val (st, sw, sh) = storeFor(o)
      val (up, uw, uh) = Exif.upright(st, sw, sh, o)
      assert((uw, uh) === ((w, h)), s"orientation $o dims")
      assert(up.toSeq === src.toSeq, s"orientation $o pixels")
    }
  }

  test("rotated capture + orientation tag hashes identically to the upright photo") {
    // a 32x20 'photo' with clear structure
    val (w, h) = (32, 20)
    val rnd = new scala.util.Random(99)
    val upright = Array.tabulate(w * h) { i =>
      val (x, y) = (i % w, i / w)
      // structured + noisy: impossible to be rotation-degenerate after
      // the hash's downsample
      math.min(255, (x * 13 + y * y) % 200 + rnd.nextInt(40))
    }
    // camera held sideways: stored pixels are the upright image rotated
    // 90° CCW, tagged orientation 6 (display: rotate 90° CW) — same
    // inverse construction the previous test verifies
    val sw = h; val sh = w
    val st = new Array[Int](w * h)
    (0 until sh).foreach { y =>
      (0 until sw).foreach { x =>
        val (nx, ny) = (sh - 1 - y, x)
        st(y * sw + x) = upright(ny * w + nx)
      }
    }
    val plain = MediaGen.jpeg(upright, w, h)
    val rotated = MediaGen.jpeg(st, sw, sh, exifOrientation = 6)
    def hashOf(bytes: Array[Byte]): (Long, Long) = {
      val d = Jpeg.decode(bytes)
      val o = Exif.fromJpeg(bytes).orientation
      val (px, pw, ph) = Exif.upright(d.samples, d.width, d.height, o)
      (ImageHash.dHash64(px, pw, ph), ImageHash.pHash64(px, pw, ph))
    }
    val (d1, p1) = hashOf(plain)
    val (d2, p2) = hashOf(rotated)
    assert(java.lang.Long.bitCount(d1 ^ d2) <= 2,
      "orientation-normalized dHash must match the upright photo")
    assert(java.lang.Long.bitCount(p1 ^ p2) <= 2,
      "orientation-normalized pHash must match the upright photo")
    // WITHOUT normalization the hashes differ wildly (the bug this fixes)
    val dRaw = {
      val d = Jpeg.decode(rotated)
      ImageHash.dHash64(d.samples, d.width, d.height)
    }
    assert(java.lang.Long.bitCount(d1 ^ dRaw) > 8,
      "unnormalized rotated hash should NOT match (else this test proves nothing)")
  }
}
