package graft.llm

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Real BMP codec + partition-wise multimodal pipeline. The golden-bytes test
  * pins the BMP layout independent of the encoder, so an order-symmetric
  * encode/decode bug (both top-down, both RGB) cannot hide in round-trips. */
class MultimodalSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("golden bytes: hand-built 2x2 bottom-up BMP decodes to known pixels") {
    // 2x2, 24bpp: stride = ceil(6/4)*4 = 8 (2 pad bytes per row).
    // Display top row:    (R=1,G=2,B=3) (R=4,G=5,B=6)
    // Display bottom row: (R=7,G=8,B=9) (R=10,G=11,B=12)
    // Bottom-up storage writes the BOTTOM display row first, BGR order.
    val hdr = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0,            // biSize, w=2, h=2
      1, 0, 24, 0, 0, 0, 0, 0, 16, 0, 0, 0,           // planes, bpp, BI_RGB, size
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    val rows = Array[Int](
      9, 8, 7, 12, 11, 10, 0, 0, // bottom display row, BGR + 2 pad
      3, 2, 1, 6, 5, 4, 0, 0)    // top display row, BGR + 2 pad
    val img = Bmp.decode((hdr ++ rows).map(_.toByte))
    assert(img.width == 2 && img.height == 2)
    assert((img.r(0, 0), img.g(0, 0), img.b(0, 0)) == ((1, 2, 3)))
    assert((img.r(1, 0), img.g(1, 0), img.b(1, 0)) == ((4, 5, 6)))
    assert((img.r(0, 1), img.g(0, 1), img.b(0, 1)) == ((7, 8, 9)))
    assert((img.r(1, 1), img.g(1, 1), img.b(1, 1)) == ((10, 11, 12)))
  }

  test("top-down BMP (negative biHeight) decodes to the same display image") {
    val base = Bmp.synthetic(3L, 0, 5, 4)
    val enc = Bmp.encode(base)
    // flip to top-down: height = -4, rows reordered to display order
    val stride = Bmp.rowStride(5)
    val flipped = enc.clone()
    flipped(22) = (-4 & 0xff).toByte; flipped(23) = 0xff.toByte
    flipped(24) = 0xff.toByte; flipped(25) = 0xff.toByte
    for (row <- 0 until 4; i <- 0 until stride)
      flipped(54 + row * stride + i) = enc(54 + (3 - row) * stride + i)
    val img = Bmp.decode(flipped)
    assert(img.rgb.toSeq == base.rgb.toSeq)
  }

  test("encode/decode round-trips across all four row-padding cases") {
    for (w <- 16 to 19; h <- Seq(3, 5)) {
      val img = Bmp.synthetic(42L, 1, w, h)
      val enc = Bmp.encode(img)
      assert(enc.length == Bmp.encodedSize(w, h))
      assert(enc.length == 54 + ((w * 3 + 3) & ~3) * h)
      val dec = Bmp.decode(enc)
      assert(dec.width == w && dec.height == h)
      assert(dec.rgb.toSeq == img.rgb.toSeq, s"round-trip failed at ${w}x$h")
    }
  }

  test("decode rejects bad magic, bad bpp, truncated data") {
    val ok = Bmp.encode(Bmp.synthetic(1L, 0, 4, 4))
    val badMagic = ok.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](Bmp.decode(badMagic))
    val badBpp = ok.clone(); badBpp(28) = 8
    intercept[IllegalArgumentException](Bmp.decode(badBpp))
    intercept[IllegalArgumentException](Bmp.decode(ok, 0, ok.length - 8))
  }

  test("splitFrames walks concatenated frames by their self-declared sizes") {
    val f0 = Bmp.encode(Bmp.synthetic(9L, 0, 6, 3)) // different dims per frame:
    val f1 = Bmp.encode(Bmp.synthetic(9L, 1, 4, 5)) // the walk must use bfSize,
    val f2 = Bmp.encode(Bmp.synthetic(9L, 2, 7, 2)) // not a fixed stride
    val frames = Bmp.splitFrames(f0 ++ f1 ++ f2).toSeq
    assert(frames.map(_._1) == Seq(0, 1, 2))
    assert(frames(0)._2.toSeq == f0.toSeq)
    assert(frames(1)._2.toSeq == f1.toSeq)
    assert(frames(2)._2.toSeq == f2.toSeq)
    intercept[IllegalArgumentException](
      Bmp.splitFrames(f0 ++ f1.take(10)).toSeq) // truncated tail frame
  }

  test("resizeNearest picks floor(x2*w/w2) source pixels") {
    val img = Bmp.synthetic(5L, 0, 10, 8)
    val out = Bmp.resizeNearest(img, 4, 2)
    assert(out.width == 4 && out.height == 2)
    for (y2 <- 0 until 2; x2 <- 0 until 4) {
      val sx = x2 * 10 / 4; val sy = y2 * 8 / 2
      assert(out.r(x2, y2) == img.r(sx, sy))
      assert(out.b(x2, y2) == img.b(sx, sy))
    }
  }

  test("extractFeatures matches the pixel formula (Spark end-to-end)") {
    import spark.implicits._
    val ids = Seq(0L, 1L, 7L, 13L).toDF("doc_id")
    val got = Multimodal.extractFeatures(spark, Multimodal.syntheticImages(spark, ids))
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(0L, 1L, 7L, 13L)) {
      val w = (16 + id % 8).toInt; val h = (12 + id % 5).toInt
      var sr = 0L; var ws = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
        sr += r; ws += (x + 2L * y + 1) * r
      }
      val f = got(id)
      assert(f.width == w && f.height == h && f.n_px == w.toLong * h)
      assert(f.payload_bytes == Bmp.encodedSize(w, h).toLong)
      assert(f.sum_r == sr, s"sum_r doc $id")
      assert(f.wsum_r == ws, s"wsum_r doc $id")
    }
  }

  test("WAV: golden bytes with an interposed LIST chunk decode via chunk walk") {
    // hand-built RIFF: fmt -> LIST (5 junk bytes, odd => pad byte) -> data
    // with samples [1000, -2, 3]. A fixed-offset parser (data at 36) fails;
    // only a real chunk walk with odd-size padding lands on the data chunk.
    val samples = Seq(1000, -2, 3)
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def tag(s: String) = s.map(_.toInt)
    val fmt = tag("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16)
    val list = tag("LIST") ++ le32(5) ++ Seq(1, 2, 3, 4, 5) ++ Seq(0) // pad byte
    val data = tag("data") ++ le32(6) ++ samples.flatMap(le16)
    val body = tag("WAVE") ++ fmt ++ list ++ data
    val bytes = (tag("RIFF") ++ le32(body.size) ++ body).map(_.toByte).toArray
    val pcm = Wav.decode(bytes)
    assert(pcm.sampleRate == 8000 && pcm.channels == 1)
    assert(pcm.samples.toSeq == Seq[Short](1000, -2, 3))
  }

  test("WAV: encode/decode round-trips full dynamic range; errors fail loudly") {
    val sig = Wav.Pcm(16000, 1,
      Array[Short](Short.MinValue, -1, 0, 1, Short.MaxValue, 12345))
    val back = Wav.decode(Wav.encode(sig))
    assert(back.sampleRate == 16000 && back.samples.toSeq == sig.samples.toSeq)
    val bad = Wav.encode(sig).clone(); bad(8) = 'X'
    intercept[IllegalArgumentException](Wav.decode(bad))
    val badFmt = Wav.encode(sig).clone(); badFmt(20) = 3 // not PCM
    intercept[IllegalArgumentException](Wav.decode(badFmt))
    intercept[IllegalArgumentException](Wav.decode(Wav.encode(sig).take(30)))
  }

  test("WAV: decimate keeps every k-th sample and divides the rate") {
    val sig = Wav.synthetic(7L, 10, 8000)
    val dec = Wav.decimate(sig, 4)
    assert(dec.sampleRate == 2000)
    assert(dec.samples.toSeq ==
      Seq(sig.samples(0), sig.samples(4), sig.samples(8)))
  }

  test("extractAudioFeatures matches the sample formula (Spark end-to-end)") {
    import spark.implicits._
    val ids = Seq(0L, 5L, 13L).toDF("doc_id")
    val got = Multimodal.extractAudioFeatures(spark,
        Multimodal.syntheticAudio(spark, ids))
      .collect().map(f => f.doc_id -> f).toMap
    for (id <- Seq(0L, 5L, 13L)) {
      val n = (800 + (id % 7) * 100).toInt
      var sum = 0L; var energy = 0L; var zc = 0L; var prev = 0
      for (i <- 0 until n) {
        val s = (((id * 37 + i.toLong * 13) % 2048) - 1024).toInt
        sum += s; energy += s.toLong * s
        if (i > 0 && ((s >= 0) != (prev >= 0))) zc += 1
        prev = s
      }
      val f = got(id)
      assert(f.n_samples == n && f.sum_s == sum, s"doc $id")
      assert(f.energy == energy && f.zero_cross == zc, s"doc $id")
      assert(f.zero_cross > 0, "formula must actually cross zero")
    }
  }

  test("frameSample keeps every 2nd frame of the multi-frame payload") {
    import spark.implicits._
    val ids = Seq(3L).toDF("doc_id") // 3 + 3%4 = 6 frames -> keep 0,2,4
    val got = Multimodal.frameSample(spark,
        Multimodal.syntheticVideos(spark, ids), everyK = 2)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    val w = (12 + 3 % 6); val h = (10 + 3 % 5)
    assert(got.forall(f => f.width == w && f.height == h))
    // frame 2 sum_r from the formula
    var sr = 0L
    for (y <- 0 until h; x <- 0 until w)
      sr += ((3L * 31 + 2 * 17 + x * 7 + y * 13) % 256).toInt
    assert(got.find(_.frame_idx == 2).get.sum_r == sr)
  }

  test("frameEnergies matches per-frame Σs² of the gated formula; tail dropped") {
    import spark.implicits._
    val ids = Seq(5L).toDF("doc_id") // n = 800 + 5%7*100 = 1300 -> 8 full frames
    val got = Multimodal.frameEnergies(spark,
        Multimodal.syntheticGatedAudio(spark, ids), frameLen = 160)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == (0 until 8))  // 1300/160 = 8, tail dropped
    def sample(i: Int): Long = {
      val base = (5L * 37 + i.toLong * 13) % 2048L - 1024L
      if ((i / 200) % 3 == 2) base / 16L else base
    }
    val expect = (0 until 8).map { f =>
      (f * 160 until f * 160 + 160).map(i => sample(i) * sample(i)).sum
    }
    assert(got.map(_.energy).toSeq == expect)
    // gating must be non-vacuous: quiet-block frames are far below loud ones
    assert(expect.min * 4 < expect.max,
      s"gated formula should separate frame energies, got $expect")
  }

  test("rotate90 and flipHorizontal remap coordinates exactly") {
    // 2x3 image with distinct R values so every position is identifiable
    val rgb = new Array[Byte](2 * 3 * 3)
    for (y <- 0 until 3; x <- 0 until 2) rgb((y * 2 + x) * 3) = (10 * y + x).toByte
    val img = Bmp.Image(2, 3, rgb)
    val rot = Bmp.rotate90(img) // dims 3x2; out(x,y) = in(y, h_in-1-x)
    assert(rot.width == 3 && rot.height == 2)
    for (y <- 0 until 2; x <- 0 until 3)
      assert(rot.r(x, y) == img.r(y, 3 - 1 - x), s"rot($x,$y)")
    val fl = Bmp.flipHorizontal(img)
    for (y <- 0 until 3; x <- 0 until 2)
      assert(fl.r(x, y) == img.r(2 - 1 - x, y), s"flip($x,$y)")
    // composition rot90cw ∘ flipH = transpose
    val tr = Bmp.flipHorizontal(Bmp.rotate90(img))
    for (y <- 0 until 2; x <- 0 until 3)
      assert(tr.r(x, y) == img.r(y, x), s"transpose($x,$y)")
  }

  test("imagePatches crops to whole patches and sums the right pixels") {
    import spark.implicits._
    val ids = Seq(2L).toDF("doc_id") // w = 16 + 2 = 18, h = 12 + 2 = 14
    val got = Multimodal.imagePatches(spark,
        Multimodal.syntheticImages(spark, ids), p = 4)
      .collect().sortBy(f => (f.py, f.px))
    assert(got.map(f => (f.py, f.px)).toSeq ==
      (for (py <- 0 until 3; px <- 0 until 4) yield (py, px)))  // 18/4=4, 14/4=3
    // patch (1,2) sum_r from the pixel formula, x in 8..11, y in 4..7
    var sr = 0L
    for (y <- 4 until 8; x <- 8 until 12)
      sr += ((2L * 31 + x * 7 + y * 13) % 256).toInt
    val p12 = got.find(f => f.py == 1 && f.px == 2).get
    assert(p12.sum_r == sr && p12.n_px == 16L)
  }

  test("sobelStats: uniform image has zero gradient everywhere") {
    import spark.implicits._
    // constant gray image: every kernel response must be exactly 0
    val w = 8; val h = 6
    val rgb = Array.fill(w * h * 3)(77.toByte)
    val rec = MediaRecord(1L, "image/bmp", Bmp.encode(Bmp.Image(w, h, rgb)))
    val st = Multimodal.sobelStats(spark, Seq(rec).toDS(), 10).collect().head
    assert(st.n_interior == (w - 2).toLong * (h - 2))
    assert(st.sum_mag == 0L && st.max_mag == 0L && st.n_edges == 0L)
  }

  test("sobelStats: single vertical step edge scores the known kernel response") {
    import spark.implicits._
    // left half black, right half white (one column boundary), 6x5
    val w = 6; val h = 5
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      rgb((y * w + x) * 3 + c) = if (x >= 3) 60.toByte else 0
    val rec = MediaRecord(2L, "image/bmp", Bmp.encode(Bmp.Image(w, h, rgb)))
    val st = Multimodal.sobelStats(spark, Seq(rec).toDS(), 500).collect().head
    // gray step = 3*60 = 180; |gx| at the two columns flanking the edge =
    // 4*180 = 720 (full kernel weight), gy = 0 elsewhere
    assert(st.max_mag == 720L)
    assert(st.n_edges == 2L * (h - 2)) // both flanking columns, every interior row
  }

  test("goertzelPower: pure tone at the target bin dominates DC") {
    import spark.implicits._
    val n = 200
    val coeff = 1.9753766811902755 // 2*cos(2*pi*5/200)
    val samples = Array.tabulate[Short](n)(i =>
      (1000.0 * math.sin(2.0 * math.Pi * 5.0 * i / n)).toShort)
    val rec = MediaRecord(3L, "audio/wav",
      Wav.encode(Wav.Pcm(8000, 1, samples)))
    val g = Multimodal.goertzelPower(spark, Seq(rec).toDS(), n, coeff)
      .collect().head
    assert(g.p_target > 100.0 * math.max(g.p_dc, 1.0))
  }

  test("goertzelPower rejects stereo input") {
    import spark.implicits._
    val rec = MediaRecord(4L, "audio/wav",
      Wav.encode(Wav.Pcm(8000, 2, new Array[Short](400))))
    val ex = intercept[Throwable] {
      Multimodal.goertzelPower(spark, Seq(rec).toDS(), 100, 2.0).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("mono"))))
  }
}
