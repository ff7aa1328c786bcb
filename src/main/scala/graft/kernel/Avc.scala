package graft.kernel

/** H.264/AVC sequence-parameter-set parser (ITU-T H.264 §7.3.2.1.1) —
  * codec-level truth for the crawl's dominant video format. The MP4
  * container declares presentation width/height in the
  * VisualSampleEntry, but the BITSTREAM's dimensions, profile/level,
  * interlacing and frame rate live in the SPS inside the `avcC`
  * configuration box (ISO/IEC 14496-15 §5.2.4.1) — a crawler that
  * trusts the container header alone mis-sizes anamorphic and cropped
  * streams. Frame DECODE stays out of scope (CABAC/CAVLC entropy
  * coding is a codec library; the documented stub boundary in
  * [[graft.ops.Multimodal]]); every declarative field is parsed for
  * real, including High-profile scaling-list skipping, frame cropping
  * arithmetic per chroma format, and VUI timing.
  *
  * Reference analog: the reference rasterizes page 1 via an external
  * service (`app/services/vision_service.py:41-53`) — the "bounded
  * prefix of a binary document" semantic; the SPS is exactly that
  * bounded prefix for H.264 video.
  */
object Avc {

  /** MSB-first bit reader over RBSP bytes with the two exp-Golomb
    * decodes every H.264 header field uses. Bounds-checked: reading
    * past the payload throws (callers isolate per row, C5).
    */
  final class BitReader(b: Array[Byte], from: Int, until: Int) {
    private var bitPos = from.toLong * 8
    private val endBit = until.toLong * 8
    def u1(): Int = {
      require(bitPos < endBit, "SPS truncated mid-field")
      val byte = b((bitPos >> 3).toInt) & 0xff
      val bit = (byte >> (7 - (bitPos & 7)).toInt) & 1
      bitPos += 1
      bit
    }
    def u(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | u1(); i += 1 }
      v
    }
    /** ue(v): count leading zeros z, then read z bits; value 2^z-1+bits. */
    def ue(): Int = {
      var zeros = 0
      while (u1() == 0) {
        zeros += 1
        require(zeros <= 31, "exp-Golomb run over 31 zeros - corrupt SPS")
      }
      (1 << zeros) - 1 + u(zeros)
    }
    /** se(v): signed mapping (-1)^(k+1) * ceil(k/2) of ue. */
    def se(): Int = {
      val k = ue()
      if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
    }
  }

  /** Strip emulation-prevention bytes (§7.4.1: any 0x00 0x00 0x03 in
    * the NAL byte stream encodes RBSP 0x00 0x00; the 0x03 is removed).
    */
  def rbsp(nal: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(until - from)
    var zeros = 0
    var i = from
    while (i < until) {
      val c = nal(i) & 0xff
      if (zeros >= 2 && c == 3) {
        zeros = 0 // emulation-prevention byte: drop, reset the zero run
      } else {
        out.write(c)
        zeros = if (c == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  /** Everything the SPS declares that a corpus pipeline can use.
    * `fps` is 0.0 when the VUI carries no timing info (legal — rate
    * then comes from the container); `width`/`height` are the CROPPED
    * display dimensions per the §7.4.2.1.1 frame-crop arithmetic.
    */
  final case class SpsInfo(profileIdc: Int, levelIdc: Int,
                           width: Int, height: Int,
                           frameMbsOnly: Boolean, chromaFormatIdc: Int,
                           bitDepthLuma: Int, fps: Double)

  private val HighProfiles =
    Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)

  /** §7.3.2.1.1.1 scaling_list: values are read (and discarded) with
    * the exact delta recursion so the bit cursor lands correctly.
    */
  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var last = 8; var next = 8; var j = 0
    while (j < size) {
      if (next != 0) next = (last + r.se() + 256) % 256
      if (next != 0) last = next
      j += 1
    }
  }

  /** Parse one SPS NAL (header byte included; emulation prevention
    * already stripped by [[rbsp]] — [[parseAvcC]] does both).
    */
  def parseSps(rbspBytes: Array[Byte]): SpsInfo = {
    require(rbspBytes.length >= 4, "SPS too short")
    require((rbspBytes(0) & 0x1f) == 7,
      s"not an SPS NAL (type ${rbspBytes(0) & 0x1f})")
    val r = new BitReader(rbspBytes, 1, rbspBytes.length)
    val profileIdc = r.u(8)
    r.u(8) // constraint_set flags + reserved
    val levelIdc = r.u(8)
    r.ue() // seq_parameter_set_id
    var chromaFormatIdc = 1 // default 4:2:0 for non-High profiles
    var bitDepthLuma = 8
    if (HighProfiles.contains(profileIdc)) {
      chromaFormatIdc = r.ue()
      if (chromaFormatIdc == 3) r.u1() // separate_colour_plane_flag
      bitDepthLuma = 8 + r.ue()
      r.ue() // bit_depth_chroma_minus8
      r.u1() // qpprime_y_zero_transform_bypass_flag
      if (r.u1() == 1) { // seq_scaling_matrix_present_flag
        val n = if (chromaFormatIdc == 3) 12 else 8
        var i = 0
        while (i < n) {
          if (r.u1() == 1) skipScalingList(r, if (i < 6) 16 else 64)
          i += 1
        }
      }
    }
    r.ue() // log2_max_frame_num_minus4
    val pocType = r.ue()
    if (pocType == 0) r.ue() // log2_max_pic_order_cnt_lsb_minus4
    else if (pocType == 1) {
      r.u1(); r.se(); r.se()
      val cycle = r.ue()
      var i = 0
      while (i < cycle) { r.se(); i += 1 }
    }
    r.ue() // max_num_ref_frames
    r.u1() // gaps_in_frame_num_value_allowed_flag
    val picWidthInMbs = r.ue() + 1
    val picHeightInMapUnits = r.ue() + 1
    val frameMbsOnly = r.u1() == 1
    if (!frameMbsOnly) r.u1() // mb_adaptive_frame_field_flag
    r.u1() // direct_8x8_inference_flag
    var cropL = 0; var cropR = 0; var cropT = 0; var cropB = 0
    if (r.u1() == 1) { // frame_cropping_flag
      cropL = r.ue(); cropR = r.ue(); cropT = r.ue(); cropB = r.ue()
    }
    // §7.4.2.1.1: crop units depend on chroma subsampling and field coding
    val (subW, subH) = chromaFormatIdc match {
      case 0 | 3 => (1, 1) // monochrome / 4:4:4
      case 1     => (2, 2) // 4:2:0
      case 2     => (2, 1) // 4:2:2
      case other =>
        throw new IllegalArgumentException(s"bad chroma_format_idc $other")
    }
    val cropUnitX = subW
    val cropUnitY = subH * (if (frameMbsOnly) 1 else 2)
    val frameHeightInMbs = (if (frameMbsOnly) 1 else 2) * picHeightInMapUnits
    val width = picWidthInMbs * 16 - cropUnitX * (cropL + cropR)
    val height = frameHeightInMbs * 16 - cropUnitY * (cropT + cropB)
    require(width > 0 && height > 0, s"crop exceeds coded size ($width x $height)")
    // ---- VUI (optional): only timing_info is extracted; every field
    // before it is cursor-advanced per §E.1.1 so the read stays aligned
    var fps = 0.0
    if (r.u1() == 1) { // vui_parameters_present_flag
      if (r.u1() == 1) { // aspect_ratio_info_present_flag
        val idc = r.u(8)
        if (idc == 255) { r.u(16); r.u(16) } // Extended_SAR
      }
      if (r.u1() == 1) r.u1() // overscan
      if (r.u1() == 1) { // video_signal_type_present_flag
        r.u(3); r.u1()
        if (r.u1() == 1) { r.u(8); r.u(8); r.u(8) } // colour_description
      }
      if (r.u1() == 1) { r.ue(); r.ue() } // chroma_loc_info
      if (r.u1() == 1) { // timing_info_present_flag
        val numUnitsInTick = r.u(16).toLong << 16 | r.u(16)
        val timeScale = r.u(16).toLong << 16 | r.u(16)
        r.u1() // fixed_frame_rate_flag
        // a frame is two field ticks (§E.2.1 note 4)
        if (numUnitsInTick > 0) fps = timeScale.toDouble / (2.0 * numUnitsInTick)
      }
      // trailing VUI fields (HRD etc.) are irrelevant to the probe
    }
    SpsInfo(profileIdc, levelIdc, width, height, frameMbsOnly,
      chromaFormatIdc, bitDepthLuma, fps)
  }

  /** AVCDecoderConfigurationRecord (ISO/IEC 14496-15 §5.2.4.1.1):
    * version(1) profile(1) compat(1) level(1) 0xFC|lengthSizeMinusOne
    * 0xE0|numSPS, then per SPS a be16 length + NAL bytes. Parses the
    * first SPS (streams with several SPSs switch resolution mid-file;
    * the first governs the opening frames, which is the probe's
    * contract).
    */
  def parseAvcC(b: Array[Byte], from: Int, until: Int): SpsInfo = {
    require(until - from >= 8, "avcC too short")
    require((b(from) & 0xff) == 1, s"avcC version ${b(from) & 0xff}")
    val numSps = b(from + 5) & 0x1f
    require(numSps >= 1, "avcC with no SPS")
    val len = ((b(from + 6) & 0xff) << 8) | (b(from + 7) & 0xff)
    require(from + 8 + len <= until, "avcC SPS overruns box")
    parseSps(rbsp(b, from + 8, from + 8 + len))
  }
}
