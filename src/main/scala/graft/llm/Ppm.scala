package graft.llm

/** Minimal, real, pure-JVM PPM (portable pixmap, binary `P6`) codec — the second
  * uncompressed interchange format next to [[Bmp]], so the multimodal pipeline
  * exercises FORMAT DISPATCH (media_type-routed decode) rather than a single
  * hardwired codec. Scope mirrors the reference's image archetype
  * (reference/README.md:53-77): opaque binary payloads flowing through tasks,
  * decoded partition-wise on executors.
  *
  * The header parser is real netpbm parsing: whitespace-separated tokens,
  * `#`-to-end-of-line comments allowed anywhere in the header, exactly one
  * whitespace byte after maxval before the raster. The raster is row-major
  * top-down RGB — no padding, no channel swap (deliberately DIFFERENT from
  * BMP's padded bottom-up BGR, so a dispatch bug feeding one format to the
  * other decoder cannot produce the right statistics). */
object Ppm {

  /** Encode as binary P6 with maxval 255 (raster = the image's own top-down
    * RGB order). */
  def encode(img: Bmp.Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Encoded size for a `width`×`height` P6 with maxval 255. */
  def encodedSize(width: Int, height: Int): Int =
    3 + width.toString.length + 1 + height.toString.length + 1 + 4 +
      3 * width * height

  /** Decode a binary P6 payload (maxval <= 255). Real header parse: token
    * scanner with `#` comments and arbitrary whitespace runs. */
  def decode(bytes: Array[Byte]): Bmp.Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6',
      "bad PPM magic (P6 only)")
    var off = 2

    @inline def isSpace(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b

    // skip whitespace and '#' comments; position lands on the next token byte
    def skip(): Unit = {
      var done = false
      while (!done && off < bytes.length) {
        if (isSpace(bytes(off))) off += 1
        else if (bytes(off) == '#') {
          while (off < bytes.length && bytes(off) != '\n') off += 1
        } else done = true
      }
    }

    def nextInt(): Int = {
      skip()
      require(off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9',
        s"expected header integer at offset $off")
      var v = 0
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') {
        v = v * 10 + (bytes(off) - '0')
        off += 1
      }
      v
    }

    val width = nextInt()
    val height = nextInt()
    val maxval = nextInt()
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(maxval > 0 && maxval <= 255, s"unsupported maxval $maxval (1-byte only)")
    // exactly ONE whitespace byte separates maxval from the raster (netpbm spec)
    require(off < bytes.length && isSpace(bytes(off)),
      "missing raster separator after maxval")
    off += 1
    val need = 3L * width * height
    require(bytes.length - off >= need,
      s"truncated raster: need $need, have ${bytes.length - off}")
    val rgb = java.util.Arrays.copyOfRange(bytes, off, off + need.toInt)
    Bmp.Image(width, height, rgb)
  }
}
