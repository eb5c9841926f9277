package graft.llm

/** Minimal, real, pure-JVM BMP (Windows bitmap) codec: 24-bit uncompressed
  * BITMAPINFOHEADER images, the standard uncompressed interchange format. This
  * replaces the round-3..7 `decodeStub`: the multimodal queries now run an actual
  * header-parse + pixel decode (little-endian fields, 4-byte row padding,
  * bottom-up vs top-down row order, BGR channel order) on every record, so the
  * decode step is hash-checkable instead of rows-only.
  *
  * Scope mirrors the reference's grayscale-image archetype
  * (reference/README.md:53-77 — images as opaque binary payloads flowing through
  * tasks): one self-describing binary payload per record, decoded partition-wise
  * on executors. Compressed codecs (JPEG/PNG) would slot in behind the same
  * [[Image]] interface; BMP/P6 keeps the codec dependency-free per the
  * environment constraint (no image libraries in the container).
  */
object Bmp {

  /** A decoded image: top-down row-major RGB triples (`rgb(3*(y*width+x))` = R). */
  final case class Image(width: Int, height: Int, rgb: Array[Byte]) {
    def r(x: Int, y: Int): Int = rgb(3 * (y * width + x)) & 0xff
    def g(x: Int, y: Int): Int = rgb(3 * (y * width + x) + 1) & 0xff
    def b(x: Int, y: Int): Int = rgb(3 * (y * width + x) + 2) & 0xff
  }

  private val FileHeaderBytes = 14
  private val InfoHeaderBytes = 40
  private val DataOffset = FileHeaderBytes + InfoHeaderBytes

  /** Bytes per stored pixel row: 3 per pixel, padded up to a 4-byte boundary. */
  def rowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Total encoded size for a `width`×`height` 24-bit BMP. */
  def encodedSize(width: Int, height: Int): Int =
    DataOffset + rowStride(width) * height

  /** Encode as a standard bottom-up 24-bit BMP (BGR byte order, padded rows). */
  def encode(img: Image): Array[Byte] = {
    val stride = rowStride(img.width)
    val dataSize = stride * img.height
    val out = new Array[Byte](DataOffset + dataSize)
    @inline def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
      out(off + 2) = ((v >>> 16) & 0xff).toByte
      out(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    @inline def le16(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >>> 8) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, out.length)        // bfSize
    le32(6, 0)                 // bfReserved
    le32(10, DataOffset)       // bfOffBits
    le32(14, InfoHeaderBytes)  // biSize
    le32(18, img.width)
    le32(22, img.height)       // positive => bottom-up row storage
    le16(26, 1)                // biPlanes
    le16(28, 24)               // biBitCount
    le32(30, 0)                // BI_RGB (uncompressed)
    le32(34, dataSize)
    le32(38, 2835); le32(42, 2835) // 72 DPI in px/m
    le32(46, 0); le32(50, 0)
    var y = 0
    while (y < img.height) {
      val srcRow = img.height - 1 - y // stored bottom-up
      val rowOff = DataOffset + y * stride
      var x = 0
      while (x < img.width) {
        val p = (srcRow * img.width + x) * 3
        out(rowOff + x * 3) = img.rgb(p + 2)     // B
        out(rowOff + x * 3 + 1) = img.rgb(p + 1) // G
        out(rowOff + x * 3 + 2) = img.rgb(p)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  @inline private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** The declared file size (bfSize) of the BMP starting at `off` — used by
    * [[splitFrames]] to walk a concatenated multi-frame payload. */
  def declaredSize(bytes: Array[Byte], off: Int): Int = {
    require(bytes.length - off >= FileHeaderBytes &&
      bytes(off) == 'B' && bytes(off + 1) == 'M',
      s"not a BMP at offset $off")
    i32(bytes, off + 2)
  }

  /** Decode a 24-bit uncompressed BMP slice `[off, off+len)`. Handles both
    * bottom-up (positive biHeight) and top-down (negative biHeight) storage and
    * arbitrary row padding; output is always top-down RGB. */
  def decode(bytes: Array[Byte], off: Int, len: Int): Image = {
    require(len >= DataOffset, s"truncated BMP: $len bytes")
    require(bytes(off) == 'B' && bytes(off + 1) == 'M', "bad BMP magic")
    val dataOff = i32(bytes, off + 10)
    val hdrSize = i32(bytes, off + 14)
    require(hdrSize >= InfoHeaderBytes, s"unsupported DIB header size $hdrSize")
    val width = i32(bytes, off + 18)
    val rawHeight = i32(bytes, off + 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val bpp = u16(bytes, off + 28)
    val compression = i32(bytes, off + 30)
    require(bpp == 24, s"unsupported bit depth $bpp (24-bit only)")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    require(width > 0 && height > 0, s"bad dimensions ${width}x$rawHeight")
    val stride = rowStride(width)
    require(dataOff + stride.toLong * height <= len,
      s"truncated pixel data: need ${dataOff + stride.toLong * height}, have $len")
    val rgb = new Array[Byte](width * height * 3)
    var row = 0
    while (row < height) {
      // stored row `row` is display row `row` (top-down) or `height-1-row`
      val y = if (topDown) row else height - 1 - row
      val rowOff = off + dataOff + row * stride
      var x = 0
      while (x < width) {
        val p = (y * width + x) * 3
        rgb(p) = bytes(rowOff + x * 3 + 2)     // R
        rgb(p + 1) = bytes(rowOff + x * 3 + 1) // G
        rgb(p + 2) = bytes(rowOff + x * 3)     // B
        x += 1
      }
      row += 1
    }
    Image(width, height, rgb)
  }

  def decode(bytes: Array[Byte]): Image = decode(bytes, 0, bytes.length)

  /** Walk a payload of concatenated BMP frames (the uncompressed-video container
    * shape: each frame self-describes its length via bfSize). Lazy — one frame
    * materialized at a time, so a huge multi-frame payload never holds all
    * decoded frames at once. */
  def splitFrames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] =
    new Iterator[(Int, Array[Byte])] {
      private var off = 0
      private var idx = 0
      def hasNext: Boolean = off < payload.length
      def next(): (Int, Array[Byte]) = {
        val sz = declaredSize(payload, off)
        require(sz > 0 && off + sz <= payload.length,
          s"corrupt frame $idx at offset $off: declared $sz of ${payload.length}")
        val frame = java.util.Arrays.copyOfRange(payload, off, off + sz)
        val out = (idx, frame)
        off += sz; idx += 1
        out
      }
    }

  /** Nearest-neighbor resample to `w2`×`h2` (source pixel = floor(x2*w/w2),
    * floor(y2*h/h2)) — the deterministic integer resize every thumbnail
    * pipeline starts from. */
  def resizeNearest(img: Image, w2: Int, h2: Int): Image = {
    require(w2 > 0 && h2 > 0, s"bad target ${w2}x$h2")
    val rgb = new Array[Byte](w2 * h2 * 3)
    var y2 = 0
    while (y2 < h2) {
      val sy = (y2.toLong * img.height / h2).toInt
      var x2 = 0
      while (x2 < w2) {
        val sx = (x2.toLong * img.width / w2).toInt
        val src = (sy * img.width + sx) * 3
        val dst = (y2 * w2 + x2) * 3
        rgb(dst) = img.rgb(src)
        rgb(dst + 1) = img.rgb(src + 1)
        rgb(dst + 2) = img.rgb(src + 2)
        x2 += 1
      }
      y2 += 1
    }
    Image(w2, h2, rgb)
  }

  /** Horizontal mirror: out(x, y) = in(w−1−x, y). */
  def flipHorizontal(img: Image): Image = {
    val rgb = new Array[Byte](img.rgb.length)
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val src = (y * img.width + (img.width - 1 - x)) * 3
        val dst = (y * img.width + x) * 3
        rgb(dst) = img.rgb(src)
        rgb(dst + 1) = img.rgb(src + 1)
        rgb(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Image(img.width, img.height, rgb)
  }

  /** Rotate 90° clockwise: out dims (h, w); out(x, y) = in(y, h−1−x). */
  def rotate90(img: Image): Image = {
    val w2 = img.height
    val h2 = img.width
    val rgb = new Array[Byte](img.rgb.length)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = ((img.height - 1 - x) * img.width + y) * 3
        val dst = (y * w2 + x) * 3
        rgb(dst) = img.rgb(src)
        rgb(dst + 1) = img.rgb(src + 1)
        rgb(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, rgb)
  }

  /** Deterministic synthetic frame: channel values are an integer formula of
    * (doc, frame, x, y), so a SQL oracle can recompute the expected pixel
    * statistics without any decoder — any decode error (padding, row order,
    * channel order) surfaces as a hash mismatch. */
  def synthetic(docId: Long, frame: Int, width: Int, height: Int): Image = {
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    var i = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val base = docId * 31 + frame * 17 + x * 7 + y * 13
        rgb(i) = (base % 256).toByte
        rgb(i + 1) = ((base + 101) % 256).toByte
        rgb(i + 2) = ((base + 202) % 256).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    Image(width, height, rgb)
  }
}
