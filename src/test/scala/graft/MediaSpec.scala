package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.Media
import graft.fixtures.MediaGen

/** Pure-kernel codec tests (no Spark): the writer/decoder pairs form a
  * co-designed input domain, so every decode is checked against the
  * exact source pixels/samples it was built from.
  */
class MediaSpec extends AnyFunSuite {

  test("png: round-trips exact pixels through all five row filters (grey + rgb)") {
    val r = new scala.util.Random(11)
    // h >= 10 ⇒ every filter type 0..4 appears at least twice (y % 5)
    for (ch <- Seq(1, 3)) {
      val (w, h) = (17, 12)
      val img = Array.fill[Byte](w * h * ch)(r.nextInt(256).toByte)
      val d = Media.decodePng(MediaGen.png(img, w, h, ch))
      assert(d.codec === "png" && d.width === w && d.height === h)
      val want = Array.tabulate(w * h) { i =>
        if (ch == 1) img(i) & 0xff
        else ((img(i * 3) & 0xff) * 299 + (img(i * 3 + 1) & 0xff) * 587 +
          (img(i * 3 + 2) & 0xff) * 114) / 1000
      }
      assert(d.samples.toSeq === want.toSeq, s"channels=$ch")
    }
  }

  test("bmp: bottom-up padded rows decode to top-down luminance") {
    // top half pure white, bottom half pure black — if the decoder gets
    // the bottom-up file order wrong, the halves swap
    val (w, h) = (5, 4) // w*3=15 ⇒ rows padded to 16 bytes
    val img = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h * 3 / 2) img(i) = 0xff.toByte
    val d = Media.decodeBmp(MediaGen.bmp(img, w, h))
    assert(d.width === w && d.height === h)
    assert(d.samples.take(w * h / 2).forall(_ === 255))
    assert(d.samples.drop(w * h / 2).forall(_ === 0))
  }

  test("wav: PCM samples, rate and frame count decode exactly") {
    val samples = Array.tabulate(300)(i => (math.sin(i / 10.0) * 20000).toInt.toShort)
    val d = Media.decodeWav(MediaGen.wav(samples, 16000))
    assert(d.codec === "wav" && d.sampleRate === 16000 && d.frames === 300)
    assert(d.samples.toSeq === samples.map(_.toInt).toSeq)
  }

  test("malformed payloads are rejected, not mis-decoded") {
    val r = new scala.util.Random(5)
    val img = Array.fill[Byte](8 * 8 * 3)(r.nextInt(256).toByte)
    val goodPng = MediaGen.png(img, 8, 8, 3)
    // truncated IDAT
    intercept[Exception](Media.decodePng(goodPng.take(goodPng.length - 20)))
    // interlaced flag set → explicit rejection (IHDR data: sig 8 + len 4
    // + type 4 + w 4 + h 4 + depth 1 + colour 1 + compression 1 +
    // filter 1 ⇒ interlace byte at offset 28; CRC is not validated)
    val interlaced = goodPng.clone(); interlaced(28) = 1
    intercept[Exception](Media.decodePng(interlaced))
    // compressed BMP rejected
    val bmpBytes = MediaGen.bmp(img, 8, 8)
    val rle = bmpBytes.clone(); rle(30) = 1
    intercept[Exception](Media.decodeBmp(rle))
    // WAV with a non-PCM format code
    val wavBytes = MediaGen.wav(Array[Short](1, 2, 3), 8000)
    val nonPcm = wavBytes.clone(); nonPcm(20) = 3
    intercept[Exception](Media.decodeWav(nonPcm))
    // crafted negative chunk length must throw, not loop forever
    // (fmt chunk length at offset 16..19 → 0xFFFFFFFF = -1)
    val negLen = wavBytes.clone()
    negLen(16) = 0xff.toByte; negLen(17) = 0xff.toByte
    negLen(18) = 0xff.toByte; negLen(19) = 0xff.toByte
    intercept[Exception](Media.decodeWav(negLen))
  }

  test("fuzz: random images/audio round-trip exactly (300 seeded samples)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val caseGen = for {
      w <- Gen.chooseNum(1, 40)
      h <- Gen.chooseNum(1, 30)
      ch <- Gen.oneOf(1, 3)
      kind <- Gen.oneOf("png", "bmp", "wav")
      n <- Gen.chooseNum(1, 400)
      rate <- Gen.oneOf(8000, 16000, 44100)
    } yield (kind, w, h, ch, n, rate)
    var seed = Seed(23L)
    val r = new scala.util.Random(23)
    (1 to 300).foreach { k =>
      val (kind, w, h, ch, n, rate) = caseGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      kind match {
        case "png" =>
          val img = Array.fill[Byte](w * h * ch)(r.nextInt(256).toByte)
          val d = Media.decodePng(MediaGen.png(img, w, h, ch))
          assert(d.width === w && d.height === h, s"sample #$k dims")
          val want = Array.tabulate(w * h) { i =>
            if (ch == 1) img(i) & 0xff
            else ((img(i * 3) & 0xff) * 299 + (img(i * 3 + 1) & 0xff) * 587 +
              (img(i * 3 + 2) & 0xff) * 114) / 1000
          }
          assert(d.samples.toSeq === want.toSeq, s"sample #$k pixels")
        case "bmp" =>
          val img = Array.fill[Byte](w * h * 3)(r.nextInt(256).toByte)
          val d = Media.decodeBmp(MediaGen.bmp(img, w, h))
          assert(d.width === w && d.height === h, s"sample #$k dims")
          val want = Array.tabulate(w * h) { i =>
            ((img(i * 3) & 0xff) * 114 + (img(i * 3 + 1) & 0xff) * 587 +
              (img(i * 3 + 2) & 0xff) * 299) / 1000 // fixture pixels are BGR rows
          }
          assert(d.samples.toSeq === want.toSeq, s"sample #$k pixels")
        case _ =>
          val samples = Array.fill[Short](n)(r.nextInt(65536).toShort)
          val d = Media.decodeWav(MediaGen.wav(samples, rate))
          assert(d.sampleRate === rate && d.frames === n, s"sample #$k header")
          assert(d.samples.toSeq === samples.map(_.toInt).toSeq, s"sample #$k samples")
      }
    }
  }

  test("writers are deterministic byte generators") {
    val r1 = MediaGen.media(40).map(_.payload.toSeq)
    val r2 = MediaGen.media(40).map(_.payload.toSeq)
    assert(r1 === r2)
  }
}
