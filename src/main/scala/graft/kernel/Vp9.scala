package graft.kernel

/** VP9 uncompressed keyframe header parse (VP9 Bitstream & Decoding
  * Process Specification §6.2 — the public Google/WebM spec): profile,
  * bit depth, color config, coded frame size and render size, straight
  * from the bitstream a WebM `V_VP9` SimpleBlock carries. Inter-frame
  * DECODE stays behind the codec-library boundary (like H.264); this
  * is the VP9 analog of [[Avc.parseSps]] — container dims can lie,
  * the keyframe header cannot.
  */
object Vp9 {

  final case class Vp9Info(profile: Int, bitDepth: Int,
                           width: Int, height: Int,
                           renderWidth: Int, renderHeight: Int)

  private final class Bits(p: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) {
        require(pos < p.length * 8, "VP9 header truncated")
        v = (v << 1) | ((p(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; i += 1
      }
      v
    }
  }

  /** Parse the frame at the start of `d`; throws unless it is a shown
    * VP9 KEYFRAME (the first block of a stream always is).
    */
  def parseKeyframeHeader(d: Array[Byte]): Vp9Info = {
    val r = new Bits(d)
    require(r.u(2) == 2, "bad VP9 frame marker")
    val profile = r.u(1) | (r.u(1) << 1)
    if (profile == 3) require(r.u(1) == 0, "reserved profile bit set")
    require(r.u(1) == 0, "show_existing_frame carries no header")
    require(r.u(1) == 0, "not a keyframe")
    r.u(1) // show_frame
    r.u(1) // error_resilient_mode
    require(r.u(24) == 0x498342, "bad VP9 frame sync code")
    // ---- color_config (§6.2.2)
    val bitDepth = if (profile >= 2) { if (r.u(1) == 1) 12 else 10 } else 8
    val colorSpace = r.u(3)
    if (colorSpace != 7) { // != CS_RGB
      r.u(1) // color_range
      if (profile == 1 || profile == 3) {
        r.u(1); r.u(1) // subsampling_x/y
        require(r.u(1) == 0, "reserved color bit set")
      }
    } else if (profile == 1 || profile == 3) {
      require(r.u(1) == 0, "reserved color bit set")
    }
    // ---- frame_size / render_size (§6.2.3-4)
    val w = r.u(16) + 1
    val h = r.u(16) + 1
    val (rw, rh) = if (r.u(1) == 1) (r.u(16) + 1, r.u(16) + 1) else (w, h)
    Vp9Info(profile, bitDepth, w, h, rw, rh)
  }
}
