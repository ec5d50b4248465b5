package graft.operators

/** Self-contained media codec over uncompressed container formats —
  * the REAL decode path behind the multimodal operators (no external
  * codec library exists in this environment, so the formats are the
  * classic zero-dependency ones every toolchain can read):
  *
  *  - images: binary PPM (P6, Netpbm) and 24-bit uncompressed BMP
  *    (BITMAPINFOHEADER, bottom-up rows, 4-byte row padding, BGR byte
  *    order — the container details a real parser must invert)
  *  - audio: RIFF/WAVE, 16-bit little-endian PCM (chunk-walking
  *    parser: fmt /data discovery, odd-size pad bytes)
  *  - video: YUV4MPEG2 (Y4M), C444 planar frames behind `FRAME`
  *    markers — the uncompressed interchange format ffmpeg/mjpegtools
  *    pipe between stages
  *
  * Decoding is TOTAL: malformed or foreign bytes decode to
  * [[MediaCodec.UnknownMedia]] instead of throwing, because one
  * corrupt object must never abort a 100 TB scan (the same
  * null-not-error contract as `try_parse_json` on the events side).
  * Every parser reads the fields it needs from the actual header
  * bytes — dimensions, sample counts and frame counts reported
  * upstream are parsed, not assumed.
  *
  * Perceptual hashing ([[aHash64]]) and feature extraction
  * ([[contentUnits]]) operate on DECODED content (pixels, samples,
  * planes), not container bytes — so the same logical image hashes
  * identically whether it shipped as PPM or BMP (container-invariance
  * is what makes the hash *perceptual*; MultimodalSpec pins it).
  */
object MediaCodec extends Serializable {

  sealed trait Media extends Serializable
  /** Row-major, top-down, RGB interleaved — container order (BMP's
    * bottom-up BGR, …) is normalized away by the decoder. */
  final case class ImageMedia(width: Int, height: Int, format: String,
                              rgb: Array[Byte]) extends Media
  final case class AudioMedia(sampleRate: Int, samples: Array[Short]) extends Media
  /** One frame = 3 planes (Y,U,V) of width*height bytes each. */
  final case class VideoMedia(width: Int, height: Int,
                              frames: Array[Array[Byte]]) extends Media
  final case class UnknownMedia(nBytes: Int) extends Media

  // ---------------------------------------------------------------- sniff

  def sniff(b: Array[Byte]): String = {
    def at(i: Int): Int = if (i < b.length) b(i) & 0xff else -1
    if (at(0) == 'P' && at(1) == '6') "ppm"
    else if (at(0) == 'B' && at(1) == 'M') "bmp"
    else if (b.length >= 12 && new String(b, 0, 4, "US-ASCII") == "RIFF" &&
      new String(b, 8, 4, "US-ASCII") == "WAVE") "wav"
    else if (b.length >= 9 && new String(b, 0, 9, "US-ASCII") == "YUV4MPEG2") "y4m"
    else "unknown"
  }

  // -------------------------------------------------------------- encoders

  /** `P6\n{w} {h}\n255\n` + 3wh RGB bytes. */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"rgb length ${rgb.length} != 3*$w*$h")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  private def putIntLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def putShortLE(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def getIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getShortLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** 24 bpp uncompressed BMP: 14-byte file header + 40-byte
    * BITMAPINFOHEADER, rows bottom-up, each padded to 4 bytes, pixels
    * stored BGR. `rgb` is logical (top-down RGB); the flip and channel
    * swap are the encoder's job, inverted by [[decodeBmp]]. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"rgb length ${rgb.length} != 3*$w*$h")
    val stride = ((3 * w + 3) / 4) * 4
    val dataSize = stride * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putIntLE(out, 2, 54 + dataSize) // file size
    putIntLE(out, 10, 54)           // pixel-array offset
    putIntLE(out, 14, 40)           // BITMAPINFOHEADER size
    putIntLE(out, 18, w)
    putIntLE(out, 22, h)            // positive height = bottom-up
    putShortLE(out, 26, 1)          // planes
    putShortLE(out, 28, 24)         // bpp
    putIntLE(out, 30, 0)            // BI_RGB (uncompressed)
    putIntLE(out, 34, dataSize)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val src = (y * w + x) * 3
        out(rowOff + x * 3) = rgb(src + 2)     // B
        out(rowOff + x * 3 + 1) = rgb(src + 1) // G
        out(rowOff + x * 3 + 2) = rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** RIFF/WAVE, PCM 16-bit mono little-endian: 44-byte canonical
    * header + 2 bytes per sample. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = 2 * samples.length
    val out = new Array[Byte](44 + dataSize)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putIntLE(out, 4, 36 + dataSize)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putIntLE(out, 16, 16)            // fmt chunk size
    putShortLE(out, 20, 1)           // PCM
    putShortLE(out, 22, 1)           // mono
    putIntLE(out, 24, sampleRate)
    putIntLE(out, 28, sampleRate * 2) // byte rate
    putShortLE(out, 32, 2)           // block align
    putShortLE(out, 34, 16)          // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putIntLE(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putShortLE(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** `YUV4MPEG2 W{w} H{h} F25:1 Ip A0:0 C444\n` then per frame
    * `FRAME\n` + 3 planes of w*h bytes. */
  def encodeY4m(w: Int, h: Int, frames: Array[Array[Byte]]): Array[Byte] = {
    val frameSize = 3 * w * h
    frames.foreach(f => require(f.length == frameSize,
      s"frame length ${f.length} != 3*$w*$h"))
    val header = s"YUV4MPEG2 W$w H$h F25:1 Ip A0:0 C444\n".getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + frames.length * (marker.length + frameSize))
    var off = 0
    System.arraycopy(header, 0, out, off, header.length); off += header.length
    frames.foreach { f =>
      System.arraycopy(marker, 0, out, off, marker.length); off += marker.length
      System.arraycopy(f, 0, out, off, frameSize); off += frameSize
    }
    out
  }

  // -------------------------------------------------------------- decoders

  /** Total decode: sniff the container, parse it, or report
    * [[UnknownMedia]] on foreign/malformed bytes. */
  def decode(b: Array[Byte]): Media = {
    if (b == null) return UnknownMedia(0)
    try sniff(b) match {
      case "ppm" => decodePpm(b)
      case "bmp" => decodeBmp(b)
      case "wav" => decodeWav(b)
      case "y4m" => decodeY4m(b)
      case _     => UnknownMedia(b.length)
    } catch {
      // a parser running off the end of truncated bytes is DATA dirt,
      // not a code path worth aborting a scan for
      case _: IndexOutOfBoundsException | _: NumberFormatException |
           _: NegativeArraySizeException => UnknownMedia(b.length)
    }
  }

  /** Netpbm P6 parser: token scanner over the header (whitespace-
    * separated magic/width/height/maxval, `#` comments legal between
    * tokens), a single whitespace byte, then the raster. */
  private[operators] def decodePpm(b: Array[Byte]): Media = {
    var pos = 2 // past "P6"
    def skipSeparators(): Unit = {
      var going = true
      while (going && pos < b.length) {
        val c = b(pos) & 0xff
        if (c == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') pos += 1
        else going = false
      }
    }
    def readInt(): Int = {
      skipSeparators()
      var v = 0; var any = false
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') {
        v = v * 10 + (b(pos) - '0'); pos += 1; any = true
      }
      if (!any) throw new NumberFormatException("ppm header")
      v
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    pos += 1 // exactly ONE whitespace byte terminates the header (spec)
    // raster size in LONG: 3*w*h wraps Int for w,h ≥ ~46341 and a
    // wrapped-negative size would sail past a plain length check into
    // copyOfRange's IllegalArgumentException — an exception class the
    // total-decode catch does NOT cover (max-effort review, r12)
    if (w <= 0 || h <= 0 || maxval != 255 ||
        3L * w * h > (b.length - pos).toLong)
      return UnknownMedia(b.length)
    ImageMedia(w, h, "ppm", java.util.Arrays.copyOfRange(b, pos, pos + 3 * w * h))
  }

  /** BMP parser: pixel-array offset read from the file header (not
    * assumed 54), 24 bpp uncompressed only, positive height =
    * bottom-up (negative = top-down, also handled — real files ship
    * both), BGR → RGB swap, padded-stride walk. */
  private[operators] def decodeBmp(b: Array[Byte]): Media = {
    if (b.length < 54) return UnknownMedia(b.length)
    val pixelOff = getIntLE(b, 10)
    val w = getIntLE(b, 18)
    val hRaw = getIntLE(b, 22)
    val bpp = getShortLE(b, 28)
    val compression = getIntLE(b, 30)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    // the raster bound also keeps 3*w+3 (stride) and 3*w*h (alloc)
    // inside Int — wrapped values only failed through caught
    // exceptions here, but the guard makes malformed-header rejection
    // explicit instead of incidental (max-effort review, r12)
    if (w <= 0 || h == 0 || bpp != 24 || compression != 0 ||
        3L * w * h > Int.MaxValue.toLong)
      return UnknownMedia(b.length)
    val stride = ((3 * w + 3) / 4) * 4
    if (pixelOff < 0 || b.length - pixelOff < stride.toLong * h)
      return UnknownMedia(b.length)
    val rgb = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val rowOff = pixelOff + srcRow * stride
      var x = 0
      while (x < w) {
        val dst = (y * w + x) * 3
        rgb(dst) = b(rowOff + x * 3 + 2)     // R
        rgb(dst + 1) = b(rowOff + x * 3 + 1) // G
        rgb(dst + 2) = b(rowOff + x * 3)     // B
        x += 1
      }
      y += 1
    }
    ImageMedia(w, h, "bmp", rgb)
  }

  /** RIFF chunk walker: finds `fmt ` and `data` wherever they sit
    * (LIST/INFO chunks may precede them in real files), honors the
    * odd-size pad byte, accepts PCM 16-bit only. */
  private[operators] def decodeWav(b: Array[Byte]): Media = {
    var pos = 12 // past RIFF size WAVE
    var sampleRate = -1
    var fmtOk = false
    var samples: Array[Short] = null
    while (pos + 8 <= b.length && (samples == null || !fmtOk)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val size = getIntLE(b, pos + 4)
      // LONG bounds: pos + 8 + size wraps Int for a declared size near
      // 2³¹, sails past the check, and the data branch then allocates
      // a ~2 GB Array[Short] — an OutOfMemoryError no catch handles;
      // one 20-byte corrupt object must not kill an executor
      // (max-effort review, r12)
      if (size < 0 || pos.toLong + 8L + size > b.length.toLong)
        return UnknownMedia(b.length)
      id match {
        case "fmt " if size >= 16 =>
          val audioFormat = getShortLE(b, pos + 8)
          val channels = getShortLE(b, pos + 10)
          sampleRate = getIntLE(b, pos + 12)
          val bits = getShortLE(b, pos + 22)
          fmtOk = audioFormat == 1 && channels == 1 && bits == 16
        case "data" =>
          val n = size / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) { samples(i) = getShortLE(b, pos + 8 + 2 * i).toShort; i += 1 }
        case _ => // skip foreign chunk
      }
      pos += 8 + size + (size & 1) // RIFF chunks pad to even
    }
    if (!fmtOk || samples == null || sampleRate <= 0) UnknownMedia(b.length)
    else AudioMedia(sampleRate, samples)
  }

  /** Y4M parser: space-separated header tags (W/H required, C444
    * required — subsampled layouts are a different plane geometry),
    * then `FRAME[ params]\n` + 3 planes per frame. */
  private[operators] def decodeY4m(b: Array[Byte]): Media = {
    var eol = 9
    while (eol < b.length && b(eol) != '\n') eol += 1
    if (eol >= b.length) return UnknownMedia(b.length)
    val header = new String(b, 0, eol, "US-ASCII")
    var w = -1; var h = -1; var c444 = false
    header.split(" ").drop(1).foreach { tag =>
      if (tag.nonEmpty) tag.charAt(0) match {
        case 'W' => w = Integer.parseInt(tag.substring(1))
        case 'H' => h = Integer.parseInt(tag.substring(1))
        case 'C' => c444 = tag == "C444"
        case _   => // F/I/A/X tags: irrelevant to the raster layout
      }
    }
    // frame size in LONG first: 3*w*h wraps Int for absurd header
    // dims, and a wrapped value would either crash copyOfRange with
    // an uncaught IllegalArgumentException or let a frames/dims
    // mismatch escape decode entirely (max-effort review, r12)
    if (w <= 0 || h <= 0 || !c444 || 3L * w * h > b.length.toLong)
      return UnknownMedia(b.length)
    val frameSize = 3 * w * h
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = eol + 1
    while (pos < b.length) {
      if (pos + 5 > b.length ||
        new String(b, pos, 5, "US-ASCII") != "FRAME") return UnknownMedia(b.length)
      pos += 5
      while (pos < b.length && b(pos) != '\n') pos += 1 // frame params
      pos += 1
      if (pos.toLong + frameSize > b.length.toLong) return UnknownMedia(b.length)
      frames += java.util.Arrays.copyOfRange(b, pos, pos + frameSize)
      pos += frameSize
    }
    VideoMedia(w, h, frames.toArray)
  }

  // --------------------------------------------------------- derived ops

  /** The LOGICAL data units of a media object, as unsigned bytes in a
    * signed-byte array (mask 0xff to read): image → RGB pixels, audio
    * → samples shifted back to 0..255 (the fixture generator stores
    * unit−128; arbitrary 16-bit audio folds into its low byte, lossy
    * but stable, fine for hashing), video → all frame planes in
    * order, unknown → empty. These are the bytes hashes, embeddings
    * and feature histograms see — container bytes never leak in. */
  def contentUnits(m: Media): Array[Byte] = m match {
    case ImageMedia(_, _, _, rgb) => rgb
    case AudioMedia(_, samples) =>
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = (samples(i) + 128).toByte; i += 1 }
      out
    case VideoMedia(w, h, frames) =>
      val out = new Array[Byte](frames.length * 3 * w * h)
      var i = 0
      frames.foreach { f => System.arraycopy(f, 0, out, i, f.length); i += f.length }
      out
    case UnknownMedia(_) => Array.emptyByteArray
  }

  /** EXACT-integer average-hash core over per-cell (sum, count)
    * pairs: bit i set iff cell i's mean strictly exceeds the mean of
    * the 64 cell means. The comparison s_i/c_i > (Σ_j s_j/c_j)/64 is
    * cross-multiplied through a common multiple of the counts and
    * decided in BigInt — no float accumulation, no ulp ties, so the
    * hash is bit-reproducible in ANY engine with integer arithmetic
    * (which is what lets the DuckDB oracle rebuild it; the earlier
    * float mean-of-means was the one boundary a SQL mirror could
    * drift on by one ulp and flip a bit). Cells with count 0 (tiny
    * rasters) contribute a 0/1 mean, matching the old 0.0 rule. */
  private def aHashExact(s0: Array[Long], c0: Array[Long]): Long = {
    // normalize 0-count cells into LOCALS — callers' arrays stay
    // untouched (a hash should not have write side effects)
    val s = new Array[Long](64)
    val c = new Array[Long](64)
    var i = 0
    while (i < 64) {
      if (c0(i) == 0L) { s(i) = 0L; c(i) = 1L }
      else { s(i) = s0(i); c(i) = c0(i) }
      i += 1
    }
    val p = c.distinct.map(BigInt(_)).product
    val scaled = new Array[BigInt](64)
    var t = BigInt(0)
    i = 0
    while (i < 64) {
      scaled(i) = BigInt(s(i)) * (p / c(i))
      t += scaled(i)
      i += 1
    }
    var hash = 0L
    i = 0
    while (i < 64) { if (scaled(i) * 64 > t) hash |= (1L << i); i += 1 }
    hash
  }

  /** Average-hash over an arbitrary-size grayscale raster: 8×8 grid of
    * box means (integer box boundaries x0 = cx·w/8), bit cy*8+cx set
    * iff its cell mean exceeds the global cell mean — exactly, via
    * [[aHashExact]]. */
  private def aHashGray(w: Int, h: Int, gray: (Int, Int) => Int): Long = {
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8; val y1 = math.max((cy + 1) * h / 8, y0 + 1)
      var cx = 0
      while (cx < 8) {
        val x0 = cx * w / 8; val x1 = math.max((cx + 1) * w / 8, x0 + 1)
        var sum = 0L; var cnt = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) { sum += gray(x, y); cnt += 1; x += 1 }
          y += 1
        }
        sums(cy * 8 + cx) = sum; cnts(cy * 8 + cx) = cnt
        cx += 1
      }
      cy += 1
    }
    aHashExact(sums, cnts)
  }

  /** 64-bit perceptual hash of DECODED content:
    *  - image: aHash of the luma raster ((r+g+b)/3 per pixel)
    *  - audio: aHash structure over 64 equal sample spans (the 1-D
    *    signal analog: span means vs global mean)
    *  - video: aHash of the FIRST frame's Y plane (the thumbnail
    *    heuristic real video-dedup pipelines use for the cheap tier)
    *  - unknown: 0
    * Container-invariant by construction: the same pixels hash the
    * same from PPM and BMP. */
  def aHash64(m: Media): Long = m match {
    case ImageMedia(w, h, _, rgb) =>
      aHashGray(w, h, (x, y) => {
        val i = (y * w + x) * 3
        ((rgb(i) & 0xff) + (rgb(i + 1) & 0xff) + (rgb(i + 2) & 0xff)) / 3
      })
    case AudioMedia(_, samples) =>
      val n = samples.length
      if (n == 0) return 0L
      val sums = new Array[Long](64)
      val cnts = new Array[Long](64)
      var i = 0
      while (i < 64) {
        val s = (i.toLong * n / 64).toInt
        val e = ((i + 1).toLong * n / 64).toInt
        var sum = 0L; var j = s
        while (j < e) { sum += (samples(j) + 128) & 0xff; j += 1 }
        sums(i) = sum; cnts(i) = (e - s).toLong
        i += 1
      }
      aHashExact(sums, cnts)
    case VideoMedia(w, h, frames) =>
      if (frames.isEmpty) 0L
      else { val y0 = frames(0); aHashGray(w, h, (x, y) => y0(y * w + x) & 0xff) }
    case UnknownMedia(_) => 0L
  }

  /** Nearest-neighbor resample of a grayscale/interleaved plane:
    * out(x,y) = src(x·w/ow, y·h/oh) — the integer-floor mapping every
    * NN scaler uses; channels move together for interleaved RGB. */
  def resizeRgbNN(w: Int, h: Int, rgb: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](3 * ow * oh)
    var y = 0
    while (y < oh) {
      val sy = y * h / oh
      var x = 0
      while (x < ow) {
        val sx = x * w / ow
        val src = (sy * w + sx) * 3
        val dst = (y * ow + x) * 3
        out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Per-plane NN resample of one C444 frame (3 stacked w×h planes). */
  def resizeFrameNN(w: Int, h: Int, frame: Array[Byte], ow: Int, oh: Int): Array[Byte] = {
    val out = new Array[Byte](3 * ow * oh)
    var p = 0
    while (p < 3) {
      val srcOff = p * w * h
      val dstOff = p * ow * oh
      var y = 0
      while (y < oh) {
        val sy = y * h / oh
        var x = 0
        while (x < ow) {
          out(dstOff + y * ow + x) = frame(srcOff + sy * w + x * w / ow)
          x += 1
        }
        y += 1
      }
      p += 1
    }
    out
  }
}
