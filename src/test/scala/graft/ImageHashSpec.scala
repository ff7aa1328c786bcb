package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.ImageHash
import graft.fixtures.MediaGen
import graft.ops.{Dedup, Multimodal}
import org.apache.spark.sql.functions._
import scala.util.Random

class ImageHashSpec extends AnyFunSuite with SparkSuite {

  /** Deterministic textured test image: random 8×8-pixel tiles (each a
    * flat level in 30..199) plus tiny per-pixel noise. Tiles make the
    * dHash informative (a smooth gradient would hash to all-zeros for
    * EVERY image and merge everything), align with JPEG's 8×8 blocks so
    * lossy re-encode drifts only a few bits, and keep +40 brightness
    * shifts clip-free.
    */
  private def baseImage(w: Int, h: Int, seed: Int): Array[Int] = {
    val r = new Random(seed)
    val tw = (w + 7) / 8
    val tiles = Array.fill(tw * ((h + 7) / 8))(30 + r.nextInt(170))
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      math.min(215, math.max(0, tiles((y / 8) * tw + x / 8) + r.nextInt(7) - 3))
    }
  }

  private def gray3(lum: Array[Int]): Array[Byte] =
    lum.flatMap(v => Array(v.toByte, v.toByte, v.toByte))

  test("boxResize: exact integer box averages") {
    // 4x4 plane, 2x2 target: each cell is the rounded mean of a 2x2 box
    val s = Array(
      0, 10, 100, 110,
      20, 30, 120, 130,
      200, 210, 4, 5,
      220, 230, 6, 7)
    val out = ImageHash.boxResize(s, 4, 4, 2, 2)
    assert(out.toSeq == Seq((0 + 10 + 20 + 30 + 2) / 4, (100 + 110 + 120 + 130 + 2) / 4,
      (200 + 210 + 220 + 230 + 2) / 4, (4 + 5 + 6 + 7 + 2) / 4))
    // upsampling degenerates to nearest without crashing
    val up = ImageHash.boxResize(Array(1, 2, 3, 4), 2, 2, 4, 4)
    assert(up.length == 16 && up.forall(v => v >= 1 && v <= 4))
  }

  test("dHash: invariant under global brightness shift, changed by content") {
    val img = baseImage(40, 30, 1)
    val brighter = img.map(v => math.min(255, v + 40))
    assert(ImageHash.dHash64(img, 40, 30) == ImageHash.dHash64(brighter, 40, 30))
    val other = baseImage(40, 30, 2).map(v => 255 - v)
    assert(ImageHash.dHash64(img, 40, 30) != ImageHash.dHash64(other, 40, 30))
  }

  test("cross-format identity: same pixels as PNG, BMP and lossless WebP hash identically") {
    val w = 32; val h = 24
    val lum = baseImage(w, h, 3)
    val png = MediaGen.png(lum.map(_.toByte), w, h, 1)
    val bmp = MediaGen.bmp(gray3(lum), w, h)
    val rows = Seq(
      Multimodal.Media(1L, "u1", "image", png),
      Multimodal.Media(2L, "u2", "image", bmp))
    import spark.implicits._
    val hashes = Multimodal.imageHashes(rows.toDS()).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("dhash"),
        r.getAs[Long]("phash"), r.getAs[Boolean]("ok"))).sortBy(_._1)
    assert(hashes.forall(_._4), s"decode failed: ${hashes.mkString(",")}")
    assert(hashes(0)._2 == hashes(1)._2, "dhash differs across formats")
    assert(hashes(0)._3 == hashes(1)._3, "phash differs across formats")
  }

  test("noise robustness: small pixel noise moves the hash a few bits, JPEG re-encode stays near") {
    val w = 64; val h = 48
    val lum = baseImage(w, h, 4)
    val noisy = {
      val r = new Random(9)
      lum.map(v => math.min(255, math.max(0, v + r.nextInt(7) - 3)))
    }
    val d0 = ImageHash.dHash64(lum, w, h)
    val dn = ImageHash.dHash64(noisy, w, h)
    assert(ImageHash.hamming(d0, dn) <= 8, s"noise moved dhash ${ImageHash.hamming(d0, dn)} bits")
    // JPEG round-trip (lossy) stays within the dedup radius
    val jpegBytes = MediaGen.jpeg(lum, w, h)
    val dec = graft.kernel.Jpeg.decode(jpegBytes)
    val dj = ImageHash.dHash64(dec.samples, dec.width, dec.height)
    assert(ImageHash.hamming(d0, dj) <= 8, s"jpeg moved dhash ${ImageHash.hamming(d0, dj)} bits")
    val p0 = ImageHash.pHash64(lum, w, h)
    val pj = ImageHash.pHash64(dec.samples, dec.width, dec.height)
    assert(ImageHash.hamming(p0, pj) <= 10, s"jpeg moved phash ${ImageHash.hamming(p0, pj)} bits")
  }

  test("hammingPairs64: differential vs brute force at radii 0/1/3/4/8/11, any partitioning") {
    import spark.implicits._
    val r = new Random(7)
    // seeded hashes with planted near-pairs at assorted distances
    val bases = Array.fill(25)(r.nextLong())
    val planted = bases.flatMap { b =>
      val flips = r.nextInt(6) // 0..5 bit flips
      var v = b
      (0 until flips).foreach(_ => v ^= 1L << r.nextInt(64))
      Seq(b, v)
    }
    val sigs = planted.zipWithIndex.map { case (hsh, i) => (i.toLong, hsh) }
    for (maxH <- Seq(0, 1, 3, 4, 8, 11); parts <- Seq(1, 5)) {
      val df = sigs.toSeq.toDF("id", "h").repartition(parts)
      val got = Dedup.hammingPairs64(df, "id", "h", maxH)
        .select("a_id", "b_id").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        i <- sigs.indices; j <- (i + 1) until sigs.length
        if java.lang.Long.bitCount(sigs(i)._2 ^ sigs(j)._2) <= maxH
      } yield (sigs(i)._1, sigs(j)._1)).toSet
      assert(got == want, s"radius $maxH parts $parts: got ${got.size} want ${want.size}")
    }
  }

  test("hammingPairs64 plan: equi-join shuffle shape, never a similarity/cartesian join") {
    import spark.implicits._
    val df = (0 until 50).map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L)).toDF("id", "h")
    val plan = Dedup.hammingPairs64(df, "id", "h", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair join must be (block_idx, block_val) equi-join shaped:\n$plan")
  }

  test("hammingClusters: identical hashes collapse, transitive chains join, singletons survive") {
    import spark.implicits._
    // ids 1,2,3 share hash A; 4 is 2 bits from A; 5 is 2 bits from 4
    // (4 bits from A: transitive member at radius 3); 9 is far away
    val a = 0x0123456789abcdefL
    val b = a ^ (1L << 3) ^ (1L << 40)
    val c = b ^ (1L << 17) ^ (1L << 55)
    val far = ~a
    val df = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, c), (9L, far))
      .toDF("id", "h")
    val got = Dedup.hammingClusters(df, "id", "h", 3).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 9L -> 9L))
  }

  test("imageDedup end-to-end: re-encodes cluster together, distinct images apart, junk isolated") {
    import spark.implicits._
    val w = 64; val h = 48
    val lum = baseImage(w, h, 11)
    val noisy = {
      val r = new Random(5)
      lum.map(v => math.min(255, math.max(0, v + r.nextInt(5) - 2)))
    }
    val other = baseImage(w, h, 12).map(v => (v * 7 + 13) % 256)
    val rows = Seq(
      Multimodal.Media(1L, "u", "image", MediaGen.png(lum.map(_.toByte), w, h, 1)),
      Multimodal.Media(2L, "u", "image", MediaGen.bmp(gray3(lum), w, h)),
      Multimodal.Media(3L, "u", "image", MediaGen.jpeg(lum, w, h)),
      Multimodal.Media(4L, "u", "image", MediaGen.png(noisy.map(_.toByte), w, h, 1)),
      Multimodal.Media(5L, "u", "image", MediaGen.png(other.map(_.toByte), w, h, 1)),
      Multimodal.Media(6L, "u", "audio", Array[Byte](1, 2, 3, 4))) // undecodable
    val got = Multimodal.imageDedup(rows.toDS(), maxHamming = 8).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Long]("cluster"),
        r.getAs[Boolean]("keep")))
      .sortBy(_._1)
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId.keySet == Set(1L, 2L, 3L, 4L, 5L), s"got $got")
    assert(byId(1L) == 1L && byId(2L) == 1L && byId(3L) == 1L && byId(4L) == 1L,
      s"re-encodes did not cluster: $got")
    assert(byId(5L) == 5L, s"distinct image merged: $got")
    assert(got.count(_._3) == 2, s"expected exactly 2 keepers: $got")
  }
}
