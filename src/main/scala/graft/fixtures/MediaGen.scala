package graft.fixtures

import graft.ops.Multimodal.Media
import scala.util.Random

/** Deterministic media-payload generator for the multimodal plumbing
  * (container format parsed by [[graft.ops.Multimodal.decodeOne]]):
  *
  *  - `IMG1` + be32(width) + be32(height) + width*height pixel bytes
  *  - `AUD1` + be32(sample_rate) + be32(n_samples) + sample bytes
  *  - `VID1` + be32(w) + be32(h) + be32(fps) + be32(n_frames) + frame bytes
  *
  * Seeded, no wall-clock — same (n, seed) always yields identical bytes.
  */
object MediaGen {

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def body(r: Random, n: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    r.nextBytes(b)
    b
  }

  def media(n: Int, seed: Long = 42L): IndexedSeq[Media] = {
    val r = new Random(seed)
    (0 until n).map { i =>
      val host = r.nextInt(20)
      r.nextInt(3) match {
        case 0 =>
          val w = 8 + r.nextInt(56); val h = 8 + r.nextInt(40)
          Media(i.toLong, s"https://host$host.example.com/img/$i", "image",
            "IMG1".getBytes ++ be32(w) ++ be32(h) ++ body(r, w * h))
        case 1 =>
          val rate = 8000 + 4000 * r.nextInt(3); val ns = 256 + r.nextInt(1024)
          Media(i.toLong, s"https://host$host.example.com/aud/$i", "audio",
            "AUD1".getBytes ++ be32(rate) ++ be32(ns) ++ body(r, ns))
        case _ =>
          val w = 8 + r.nextInt(24); val h = 8 + r.nextInt(16)
          val fps = 10 + r.nextInt(20); val frames = 1 + r.nextInt(30)
          Media(i.toLong, s"https://host$host.example.com/vid/$i", "video",
            "VID1".getBytes ++ be32(w) ++ be32(h) ++ be32(fps) ++ be32(frames) ++
              body(r, math.min(w * h * frames, 4096)))
      }
    }
  }
}
