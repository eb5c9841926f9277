package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Real P6 PPM codec + media_type dispatch. The golden-bytes test pins the P6
  * layout independent of the encoder (same rationale as the BMP golden test);
  * the header-parser tests exercise the netpbm grammar (comments, whitespace
  * runs) a fixed-offset "parser" would fail. */
class PpmSpec extends AnyFunSuite {

  test("golden bytes: hand-built 2x2 P6 decodes to known pixels") {
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val raster = Array[Int](
      1, 2, 3, 4, 5, 6,    // top display row, RGB
      7, 8, 9, 10, 11, 12  // bottom display row, RGB
    ).map(_.toByte)
    val img = Ppm.decode(header ++ raster)
    assert(img.width == 2 && img.height == 2)
    assert((img.r(0, 0), img.g(0, 0), img.b(0, 0)) == ((1, 2, 3)))
    assert((img.r(1, 0), img.g(1, 0), img.b(1, 0)) == ((4, 5, 6)))
    assert((img.r(0, 1), img.g(0, 1), img.b(0, 1)) == ((7, 8, 9)))
    assert((img.r(1, 1), img.g(1, 1), img.b(1, 1)) == ((10, 11, 12)))
  }

  test("header parser handles comments and whitespace runs") {
    val img = Bmp.synthetic(7L, 0, 3, 2)
    val header = "P6 # comment after magic\n# full-line comment\n 3\t2 # dims\n255\n"
      .getBytes("US-ASCII")
    val dec = Ppm.decode(header ++ img.rgb)
    assert(dec.width == 3 && dec.height == 2)
    assert(dec.rgb.toSeq == img.rgb.toSeq)
  }

  test("encode/decode round-trips and size arithmetic matches") {
    for (w <- Seq(1, 9, 10, 23); h <- Seq(1, 5, 16)) {
      val img = Bmp.synthetic(11L, 2, w, h)
      val enc = Ppm.encode(img)
      assert(enc.length == Ppm.encodedSize(w, h))
      val dec = Ppm.decode(enc)
      assert(dec.width == w && dec.height == h)
      assert(dec.rgb.toSeq == img.rgb.toSeq)
    }
  }

  test("truncated raster and bad magic fail loudly") {
    val enc = Ppm.encode(Bmp.synthetic(1L, 0, 4, 4))
    intercept[IllegalArgumentException](Ppm.decode(enc.dropRight(1)))
    val bad = enc.clone(); bad(1) = '5'
    intercept[IllegalArgumentException](Ppm.decode(bad))
  }

  test("dispatch routes by media_type and rejects unknown types") {
    val img = Bmp.synthetic(5L, 0, 6, 3)
    assert(Multimodal.decodeAny("image/bmp", Bmp.encode(img)).rgb.toSeq
      == img.rgb.toSeq)
    assert(Multimodal.decodeAny("image/x-portable-pixmap", Ppm.encode(img)).rgb.toSeq
      == img.rgb.toSeq)
    // cross-feeding formats trips each codec's magic check
    intercept[IllegalArgumentException](
      Multimodal.decodeAny("image/bmp", Ppm.encode(img)))
    intercept[IllegalArgumentException](
      Multimodal.decodeAny("image/x-portable-pixmap", Bmp.encode(img)))
    intercept[IllegalArgumentException](
      Multimodal.decodeAny("image/webp", Bmp.encode(img)))
  }
}
