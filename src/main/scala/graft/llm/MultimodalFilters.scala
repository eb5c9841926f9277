package graft.llm

import org.apache.spark.sql.{Dataset, SparkSession}

/** Per-record image/audio kernel operators (split from [[Multimodal]] for
  * file-size hygiene; mixed back into `object Multimodal`, so every call
  * site keeps its `Multimodal.xyz` name): Sobel/box-blur/dither/Otsu/
  * integral/motion/equalize/gamma/clip/tile/median/morph/RLE/quant image
  * kernels, audio envelope/peak/DFT/Goertzel features, SSIM blocks, frame
  * sampling. All run inside the one codec-stage `mapPartitions` pass —
  * decode once, pure per-record CPU, integer-exact outputs (the multimodal
  * scale contract: no pixel frames, no shuffle joins on pixels).
  */
trait MultimodalFilters {

  /** Decode → 3×3 Sobel edge statistics over the grayscale (r+g+b) interior:
    * gx/gy from the standard kernels, magnitude |gx|+|gy| (the integer-exact
    * L1 form — no sqrt), per-image sum/max/edge-count. The convolution runs
    * inside the one codec-stage pass with direct neighbor indexing — no
    * pixel frame, no 9-way shuffle join; at 100 TB the kernel cost is pure
    * per-record CPU on the executor that already holds the bytes. */
  def sobelStats(spark: SparkSession, media: Dataset[MediaRecord],
      thresh: Int): Dataset[SobelStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      def g(x: Int, y: Int): Long =
        img.r(x, y).toLong + img.g(x, y) + img.b(x, y)
      var sum = 0L; var mx = 0L; var edges = 0L; var n = 0L
      var y = 1
      while (y < img.height - 1) {
        var x = 1
        while (x < img.width - 1) {
          val gx = (g(x + 1, y - 1) + 2 * g(x + 1, y) + g(x + 1, y + 1)) -
            (g(x - 1, y - 1) + 2 * g(x - 1, y) + g(x - 1, y + 1))
          val gy = (g(x - 1, y + 1) + 2 * g(x, y + 1) + g(x + 1, y + 1)) -
            (g(x - 1, y - 1) + 2 * g(x, y - 1) + g(x + 1, y - 1))
          val mag = math.abs(gx) + math.abs(gy)
          sum += mag; if (mag > mx) mx = mag; if (mag > thresh) edges += 1
          n += 1
          x += 1
        }
        y += 1
      }
      SobelStats(rec.doc_id, n, sum, mx, edges)
    })
  }

  /** Decode → 3×3 box-blur statistics over the grayscale (r+g+b) interior:
    * blur(x,y) = (Σ of the 9 neighbors) div 9 — integer truncating division,
    * the smoothing-kernel archetype next to [[sobelStats]]'s edge kernel.
    * Per-image sum / max plus the (x + 2y)-weighted checksum that makes any
    * addressing mistake (offset, border, transpose) flip the hash. Same
    * scale shape: the kernel runs inside the one codec-stage pass with
    * direct neighbor indexing — pure per-record CPU, no pixel shuffle. */
  def boxBlurStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[BlurStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      def g(x: Int, y: Int): Long =
        img.r(x, y).toLong + img.g(x, y) + img.b(x, y)
      var sum = 0L; var mx = 0L; var wsum = 0L; var n = 0L
      var y = 1
      while (y < img.height - 1) {
        var x = 1
        while (x < img.width - 1) {
          val b = (g(x - 1, y - 1) + g(x, y - 1) + g(x + 1, y - 1) +
            g(x - 1, y) + g(x, y) + g(x + 1, y) +
            g(x - 1, y + 1) + g(x, y + 1) + g(x + 1, y + 1)) / 9
          sum += b; if (b > mx) mx = b; wsum += (x + 2L * y) * b
          n += 1
          x += 1
        }
        y += 1
      }
      BlurStats(rec.doc_id, n, sum, mx, wsum)
    })
  }

  /** Bayer 4×4 ordered dithering to 1-bit over the grayscale (r+g+b) field:
    * on(x,y) ⟺ 32·g(x,y) > 765·(2·B[y%4][x%4]+1) — the classic index-matrix
    * threshold (g/765 > (B+0.5)/16) cross-multiplied into pure integers so
    * there is no float boundary to diverge on. Per-image on-count plus the
    * (x + 2y)-weighted checksum that makes any matrix-addressing mistake
    * (row/col swap, offset) flip the hash. Same scale shape as the other
    * codec stages: one partition-wise decode pass, per-record bounded state,
    * no pixel shuffle. */
  def ditherStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[DitherStats] = {
    import spark.implicits._
    val bayer = Array(
      Array(0, 8, 2, 10), Array(12, 4, 14, 6),
      Array(3, 11, 1, 9), Array(15, 7, 13, 5))
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      var nOn = 0L; var wsum = 0L
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val g = img.r(x, y).toLong + img.g(x, y) + img.b(x, y)
          if (32L * g > 765L * (2L * bayer(y % 4)(x % 4) + 1L)) {
            nOn += 1; wsum += x + 2L * y
          }
          x += 1
        }
        y += 1
      }
      DitherStats(rec.doc_id, img.width.toLong * img.height, nOn, wsum)
    })
  }

  /** Otsu's threshold over the 256-level grayscale field (level = (r+g+b)
    * div 3): maximize the between-class variance, written as the exact
    * integer rational (S0·w1 − S1·w0)² / (w0·w1) — numerator ≤ ~5e14 and
    * denominator ≤ ~6e4 are both exactly representable doubles, so the one
    * IEEE division is correctly rounded identically on every engine, and
    * ties break to the LOWEST level (strict `>` improvement scan ⟺ the
    * oracle's ORDER BY crit DESC, t ASC). Emits integer witnesses (w0, S0
    * at the optimum) so the hash pins the argmax, not a huge float. The
    * histogram is bounded per-record state (256 ints) inside the one
    * codec-stage pass — no pixel shuffle at any scale. */
  def otsuStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[OtsuStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val hist = new Array[Long](256)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val lv = ((img.r(x, y) + img.g(x, y) + img.b(x, y)) / 3).toInt
          hist(lv) += 1
          x += 1
        }
        y += 1
      }
      val n = img.width.toLong * img.height
      var sTot = 0L
      var lv = 0
      while (lv < 256) { sTot += lv * hist(lv); lv += 1 }
      var w0 = 0L; var s0 = 0L
      var best = -1.0d; var bestT = -1; var bestW0 = 0L; var bestS0 = 0L
      var t = 0
      while (t < 255) {
        w0 += hist(t); s0 += t * hist(t)
        val w1 = n - w0
        if (w0 > 0 && w1 > 0) {
          val d = s0 * w1 - (sTot - s0) * w0
          val crit = (d.toDouble * d.toDouble) / (w0.toDouble * w1)
          if (crit > best) { best = crit; bestT = t; bestW0 = w0; bestS0 = s0 }
        }
        t += 1
      }
      OtsuStats(rec.doc_id, n, bestT, bestW0, bestS0)
    })
  }

  /** Decode → strict local-maxima peak detection above `thresh`: sample i is
    * a peak iff s(i) > s(i−1) ∧ s(i) > s(i+1) ∧ s(i) ≥ thresh (interior
    * samples only — endpoints can't be maxima without a padding convention).
    * Pure integer comparisons on the decoded PCM, one codec-stage pass,
    * per-record O(1) state; the index-sum checksum makes a one-off peak
    * position flip the hash. Records with zero peaks emit no row (mirrors
    * the oracle's GROUP BY over peak rows). Mono only. */
  def peakStats(spark: SparkSession, media: Dataset[MediaRecord],
      thresh: Int): Dataset[PeakStats] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val pcm = Wav.decode(rec.payload)
      require(pcm.channels == 1, "peakStats is mono-only")
      val s = pcm.samples
      var nP = 0L; var sIdx = 0L; var mx = Int.MinValue
      var i = 1
      while (i < s.length - 1) {
        if (s(i) > s(i - 1) && s(i) > s(i + 1) && s(i) >= thresh) {
          nP += 1; sIdx += i; if (s(i) > mx) mx = s(i)
        }
        i += 1
      }
      if (nP == 0) None
      else Some(PeakStats(rec.doc_id, s.length.toLong, nP, sIdx, mx))
    })
  }

  /** Integral image (summed-area table) over the grayscale (r+g+b) field —
    * the O(1)-region-sum structure behind box filters and Haar features at
    * scale. Builds the SAT with the standard recurrence
    * I(x,y) = g + I(x−1,y) + I(x,y−1) − I(x−1,y−1) and emits three integer
    * witnesses: the total-mass corner I(w−1,h−1), the center probe
    * I(w/2,h/2), and the interior rectangle [2,w−3]×[2,h−3] evaluated via
    * the four-corner identity A−B−C+D — so a prefix-sum or identity bug
    * flips the hash even when the raw totals are right. One codec-stage
    * pass, per-record SAT buffer, no pixel shuffle. */
  def integralStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[IntegralStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      val sat = Array.ofDim[Long](h, w)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = img.r(x, y).toLong + img.g(x, y) + img.b(x, y)
          sat(y)(x) = g +
            (if (x > 0) sat(y)(x - 1) else 0L) +
            (if (y > 0) sat(y - 1)(x) else 0L) -
            (if (x > 0 && y > 0) sat(y - 1)(x - 1) else 0L)
          x += 1
        }
        y += 1
      }
      // rect [x1,x2]×[y1,y2] = I(x2,y2) − I(x1−1,y2) − I(x2,y1−1) + I(x1−1,y1−1)
      val (x1, y1, x2, y2) = (2, 2, w - 3, h - 3)
      val interior = sat(y2)(x2) - sat(y2)(x1 - 1) - sat(y1 - 1)(x2) +
        sat(y1 - 1)(x1 - 1)
      IntegralStats(rec.doc_id, w.toLong * h, sat(h - 1)(w - 1),
        sat(h / 2)(w / 2), interior)
    })
  }

  /** Block-matching motion estimation between the first two frames of each
    * multi-frame payload — the video-compression primitive. For each 4×4
    * block of frame 1, search offsets (dx,dy) ∈ [−2,2]² in frame 0 (only
    * offsets that keep the block in bounds), minimizing the integer SAD of
    * the grayscale field; ties break lexicographically on (dy,dx) — the
    * scan order both engines replay. Emits per-video aggregates including
    * the (bx + 7·by)·(dx + 5·dy) checksum, so a single block matched to the
    * wrong offset flips the hash. One codec-stage pass, per-record bounded
    * search (≤25 offsets × 16 pixels per block). */
  def motionStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[MotionStats] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val frames = Bmp.splitFrames(rec.payload).take(2)
        .map { case (_, bytes) => Bmp.decode(bytes) }.toArray
      if (frames.length < 2) Iterator.empty
      else {
        val f0 = frames(0); val f1 = frames(1)
        val w = f1.width; val h = f1.height
        def g(img: Bmp.Image, x: Int, y: Int): Long =
          img.r(x, y).toLong + img.g(x, y) + img.b(x, y)
        var nB = 0L; var sSad = 0L; var sDx = 0L; var sDy = 0L; var wMv = 0L
        var by = 0
        while ((by + 1) * 4 <= h) {
          var bx = 0
          while ((bx + 1) * 4 <= w) {
            var best = Long.MaxValue; var bestDx = 0; var bestDy = 0
            var dy = -2
            while (dy <= 2) {
              var dx = -2
              while (dx <= 2) {
                if (bx * 4 + dx >= 0 && bx * 4 + 3 + dx < w &&
                    by * 4 + dy >= 0 && by * 4 + 3 + dy < h) {
                  var sad = 0L
                  var py = 0
                  while (py < 4) {
                    var px = 0
                    while (px < 4) {
                      val x = bx * 4 + px; val y = by * 4 + py
                      sad += math.abs(g(f1, x, y) - g(f0, x + dx, y + dy))
                      px += 1
                    }
                    py += 1
                  }
                  if (sad < best) { best = sad; bestDx = dx; bestDy = dy }
                }
                dx += 1
              }
              dy += 1
            }
            nB += 1; sSad += best; sDx += bestDx; sDy += bestDy
            wMv += (bx + 7L * by) * (bestDx + 5L * bestDy)
            bx += 1
          }
          by += 1
        }
        Some(MotionStats(rec.doc_id, nB, sSad, sDx, sDy, wMv))
      }
    })
  }

  /** Histogram equalization over the 256-level grayscale field (level =
    * (r+g+b) div 3): remap each level to (cdf(level)·255) div n — pure
    * integer (cumulative count times 255, truncating division), the
    * contrast-normalization step before most classical vision features.
    * Emits per-image witnesses: distinct output levels, min/max output,
    * and the (x + 2y)-weighted remap checksum — a cumulative-histogram bug
    * flips the checksum even when the level histogram is right. Bounded
    * per-record state (256 ints) inside the one codec pass. */
  def equalizeStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[EqualizeStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      val n = w.toLong * h
      val hist = new Array[Long](256)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          hist((img.r(x, y) + img.g(x, y) + img.b(x, y)) / 3) += 1
          x += 1
        }
        y += 1
      }
      val remap = new Array[Int](256)
      var cum = 0L
      var lv = 0
      while (lv < 256) {
        cum += hist(lv)
        remap(lv) = ((cum * 255L) / n).toInt
        lv += 1
      }
      var nLevels = 0L
      val seen = new Array[Boolean](256)
      var mn = 255; var mx = 0; var wsum = 0L
      y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = remap((img.r(x, y) + img.g(x, y) + img.b(x, y)) / 3)
          if (!seen(o)) { seen(o) = true; nLevels += 1 }
          if (o < mn) mn = o
          if (o > mx) mx = o
          wsum += (x + 2L * y) * o
          x += 1
        }
        y += 1
      }
      EqualizeStats(rec.doc_id, n, nLevels, mn, mx, wsum)
    })
  }

  /** Gamma-0.5 brightening through an integer LUT: o = ⌊√(lv·255)⌋ — the
    * exposure-correction codec stage, kept EXACT by using the integer square
    * root (sqrt of a ≤16-bit integer is correctly rounded IEEE, so its floor
    * is engine-identical; no 1/2.2 pow() whose last ulp could differ). Same
    * witnesses as [[equalizeStats]]: distinct output levels, range, and the
    * position-weighted checksum that pins the remap to pixel coordinates. */
  def gammaStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[GammaStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      val lut = new Array[Int](256)
      var lv = 0
      while (lv < 256) {
        lut(lv) = math.sqrt(lv * 255.0).toInt
        lv += 1
      }
      var nLevels = 0L
      val seen = new Array[Boolean](256)
      var mn = 255; var mx = 0; var wsum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val o = lut((img.r(x, y) + img.g(x, y) + img.b(x, y)) / 3)
          if (!seen(o)) { seen(o) = true; nLevels += 1 }
          if (o < mn) mn = o
          if (o > mx) mx = o
          wsum += (x + 2L * y) * o
          x += 1
        }
        y += 1
      }
      GammaStats(rec.doc_id, w.toLong * h, nLevels, mn, mx, wsum)
    })
  }

  /** Clipping audit over the decoded PCM stream: samples at or beyond the
    * threshold magnitude count as clipped; the longest CONSECUTIVE clipped
    * run (the audible artifact — isolated peaks are fine, runs are not) and
    * the first clipped index are found in the same single decode pass.
    * Integer comparisons only. */
  def clipStats(spark: SparkSession, media: Dataset[MediaRecord],
      threshold: Int): Dataset[ClipStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val pcm = Wav.decode(rec.payload)
      var nClip = 0L
      var run = 0L
      var maxRun = 0L
      var first = -1L
      var i = 0
      while (i < pcm.samples.length) {
        val clipped = math.abs(pcm.samples(i).toInt) >= threshold
        if (clipped) {
          nClip += 1
          run += 1
          if (run > maxRun) maxRun = run
          if (first < 0) first = i
        } else run = 0
        i += 1
      }
      ClipStats(rec.doc_id, pcm.samples.length.toLong, nClip, maxRun, first)
    })
  }

  /** 4×4 tile texture map: per tile, the distinct-grayscale-level count
    * (the integer-exact texture/flatness witness — a flat tile has 1 level,
    * a busy one up to 16), level sum and extrema. Tiles are ⌈w/4⌉×⌈h/4⌉
    * with ragged edges kept (partial tiles report their true pixel count).
    * One decode pass; bounded rows per record (≤ tiles). */
  def tileStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[TileStats] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      val tw = (w + 3) / 4; val th = (h + 3) / 4
      (0 until th).iterator.flatMap { ty =>
        (0 until tw).iterator.map { tx =>
          val seen = new Array[Boolean](256)
          var nLv = 0L; var sum = 0L; var n = 0L
          var mn = 255; var mx = 0
          var y = ty * 4
          while (y < math.min(ty * 4 + 4, h)) {
            var x = tx * 4
            while (x < math.min(tx * 4 + 4, w)) {
              val lv = (img.r(x, y) + img.g(x, y) + img.b(x, y)) / 3
              if (!seen(lv)) { seen(lv) = true; nLv += 1 }
              sum += lv; n += 1
              if (lv < mn) mn = lv
              if (lv > mx) mx = lv
              x += 1
            }
            y += 1
          }
          TileStats(rec.doc_id, ty, tx, n, nLv, sum, mn, mx)
        }
      }
    })
  }

  /** Amplitude envelope over fixed 100-sample frames: per-frame peak |s|,
    * the global peak, the ATTACK frame (first frame reaching ≥ 90% of the
    * global peak, integer 9/10 threshold) and the last frame still at ≥ half
    * peak — the onset/decay shape audio pipelines gate on. Integer
    * comparisons only; one decode pass. */
  def envelopeStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[EnvelopeStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val pcm = Wav.decode(rec.payload)
      val n = pcm.samples.length
      val nFrames = (n + 99) / 100
      val peaks = new Array[Int](nFrames)
      var i = 0
      while (i < n) {
        val a = math.abs(pcm.samples(i).toInt)
        val f = i / 100
        if (a > peaks(f)) peaks(f) = a
        i += 1
      }
      var global = 0
      var f = 0
      while (f < nFrames) { if (peaks(f) > global) global = peaks(f); f += 1 }
      var attack = -1L
      var lastHalf = -1L
      f = 0
      while (f < nFrames) {
        if (attack < 0 && peaks(f).toLong * 10 >= global.toLong * 9) attack = f
        if (peaks(f).toLong * 2 >= global.toLong) lastHalf = f
        f += 1
      }
      EnvelopeStats(rec.doc_id, nFrames.toLong, global, attack, lastHalf)
    })
  }

  /** Binary 3×3 morphology on the thresholded grayscale field (on ⟺
    * r+g+b > 382, the midpoint): erosion keeps an interior pixel only if
    * all 9 neighbors are on; dilation turns a pixel on if any of the 9 is —
    * the despeckle/fill primitives of classical segmentation. Erosion and
    * dilation are counted over the INTERIOR (border pixels have no full
    * neighborhood — the no-padding convention, like [[sobelStats]]); the
    * threshold count covers the full frame. Integer comparisons only; one
    * codec pass; the (x + 2y)-weighted erosion checksum pins neighborhood
    * addressing. */
  def morphStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[MorphStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      def on(x: Int, y: Int): Boolean =
        img.r(x, y) + img.g(x, y) + img.b(x, y) > 382
      var nOn = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { if (on(x, y)) nOn += 1; x += 1 }
        y += 1
      }
      var nEr = 0L; var nDi = 0L; var wEr = 0L
      y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          var all = true; var any = false
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              if (on(x + dx, y + dy)) any = true else all = false
              dx += 1
            }
            dy += 1
          }
          if (all) { nEr += 1; wEr += x + 2L * y }
          if (any) nDi += 1
          x += 1
        }
        y += 1
      }
      MorphStats(rec.doc_id, w.toLong * h, nOn, nEr, nDi, wEr)
    })
  }

  /** 3×3 median filter over the grayscale field (level = (r+g+b) div 3),
    * interior pixels only (the valid-mode crop convention shared with
    * [[morphStats]]): per pixel, the exact middle of the 9 sorted
    * neighborhood levels — the classical salt-and-pepper denoiser. Emits
    * per-image witnesses: filtered sum, min/max, and the (x+2y)-weighted
    * checksum (a neighborhood-addressing bug flips it even when the value
    * histogram survives). Bounded per-record state; one codec pass. */
  def medianStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[MedianStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      def lv(x: Int, y: Int): Int =
        (img.r(x, y) + img.g(x, y) + img.b(x, y)) / 3
      val nb = new Array[Int](9)
      var sum = 0L; var wsum = 0L; var mn = 255; var mx = 0; var n = 0L
      var y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          var k = 0
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) { nb(k) = lv(x + dx, y + dy); k += 1; dx += 1 }
            dy += 1
          }
          java.util.Arrays.sort(nb)
          val med = nb(4)
          sum += med; wsum += (x + 2L * y) * med
          if (med < mn) mn = med
          if (med > mx) mx = med
          n += 1
          x += 1
        }
        y += 1
      }
      MedianStats(rec.doc_id, n, sum, mn, mx, wsum)
    })
  }

  /** Run-length audit of the thresholded binary field (on = r+g+b > 382,
    * the [[morphStats]] threshold): horizontal runs per image, on-runs,
    * the longest on-run, and the 2-bytes-per-run RLE size estimate — the
    * compressibility diagnostic behind bitmap/mask storage choices.
    * Bounded per-record state; one codec pass. */
  def rleStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[RleStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      def on(x: Int, y: Int): Boolean =
        img.r(x, y) + img.g(x, y) + img.b(x, y) > 382
      var nOn = 0L; var nRuns = 0L; var nRunsOn = 0L
      var maxRunOn = 0L
      var y = 0
      while (y < h) {
        var x = 0
        var cur = 0L
        while (x < w) {
          val o = on(x, y)
          if (o) nOn += 1
          if (x == 0 || o != on(x - 1, y)) {
            nRuns += 1
            if (o) { nRunsOn += 1; cur = 0L }
          }
          if (o) { cur += 1; if (cur > maxRunOn) maxRunOn = cur }
          x += 1
        }
        y += 1
      }
      RleStats(rec.doc_id, w.toLong * h, nOn, nRuns, nRunsOn, maxRunOn,
        2L * nRuns)
    })
  }

  /** 3-3-2 palette quantization (top 3 bits of R and G, top 2 of B →
    * one 8-bit code; reconstruction at each cell's midpoint): distinct
    * codes used, exact per-channel |err| sums, and the position-weighted
    * code checksum — the palette-compression quality audit, pure integer.
    * Bounded per-record state (256 seen-flags); one codec pass. */
  def quantStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[QuantStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      val w = img.width; val h = img.height
      val seen = new Array[Boolean](256)
      var nCodes = 0L; var er = 0L; var eg = 0L; var eb = 0L; var wsum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val r = img.r(x, y); val g = img.g(x, y); val b = img.b(x, y)
          val code = (r / 32) * 32 + (g / 32) * 4 + b / 64
          if (!seen(code)) { seen(code) = true; nCodes += 1 }
          er += math.abs(r - ((r / 32) * 32 + 16))
          eg += math.abs(g - ((g / 32) * 32 + 16))
          eb += math.abs(b - ((b / 64) * 64 + 32))
          wsum += (x + 2L * y) * code
          x += 1
        }
        y += 1
      }
      QuantStats(rec.doc_id, w.toLong * h, nCodes, er, eg, eb, wsum)
    })
  }

  /** Pinned DFT coefficient table for N=256 as INTEGERS: cos/sin(2π·m/256)
    * rounded HALF_UP to 12 decimals then scaled by 10¹² — the
    * no-runtime-libm discipline, made exactly mirrorable: sample·coef
    * products and their sums are pure Long arithmetic (max |Σ| ≈
    * 1024·10¹²·256 ≈ 2.7e17, well inside Long), so both engines do zero
    * float rounding until one final ÷10¹². Index by m = (k·i) mod 256 to
    * get the bin-k position-i coefficient; the whole 8-bin basis needs
    * only 256 pinned values (mirrored verbatim as the oracle's 256-row
    * VALUES table of BIGINTs). */
  private[llm] lazy val dftCoef256: (Array[Long], Array[Long]) = {
    val c = new Array[Long](256); val s = new Array[Long](256)
    var m = 0
    while (m < 256) {
      c(m) = BigDecimal(math.cos(2.0 * math.Pi * m / 256))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.unscaledValue.longValueExact
      s(m) = BigDecimal(math.sin(2.0 * math.Pi * m / 256))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.unscaledValue.longValueExact
      m += 1
    }
    (c, s)
  }

  /** Decode → DFT power at bins 1..`nBins` over the first 256 samples.
    * The correlation sums run entirely in Long (integer samples × the
    * ×10¹²-scaled pinned coefficients), so a DuckDB
    * `SUM(s_bigint * coef_bigint)` is bit-identical; the only float ops —
    * one long→double conversion, one ÷1e12, and a·a+b·b — are the same
    * IEEE ops on the same bits on both engines, so the emitted powers are
    * hashable doubles. Bounded per-record state (2·nBins Longs); one
    * codec pass. */
  def dftBinPowers(spark: SparkSession, media: Dataset[MediaRecord],
      nBins: Int): Dataset[BinPower] = {
    import spark.implicits._
    val (cosT, sinT) = dftCoef256
    media.mapPartitions(_.flatMap { rec =>
      val pcm = Wav.decode(rec.payload)
      require(pcm.channels == 1, "dftBinPowers is mono-only")
      require(pcm.samples.length >= 256, "need at least 256 samples")
      (1 to nBins).map { k =>
        var a = 0L; var b = 0L
        var i = 0
        while (i < 256) {
          val m = (k * i) % 256
          val x = pcm.samples(i).toLong
          a += x * cosT(m)
          b += x * sinT(m)
          i += 1
        }
        val av = a.toDouble / 1e12; val bv = b.toDouble / 1e12
        BinPower(rec.doc_id, k, av * av + bv * bv)
      }
    })
  }

  /** Decode → Goertzel recursion over the first `nSamples` samples:
    * s₀ = x + coeff·s₁ − s₂ per sample, power = s₁² + s₂² − coeff·s₁·s₂,
    * evaluated at the target-bin coefficient AND at DC (coeff = 2) so the
    * caller gets a tone-to-baseline contrast. The coefficient is a pinned
    * literal (2·cos(2πk/N) precomputed — no libm call at runtime on either
    * engine), and the recursion is the same pinned IEEE arithmetic a
    * recursive-CTE oracle steps. Mono only; one codec-stage pass. */
  def goertzelPower(spark: SparkSession, media: Dataset[MediaRecord],
      nSamples: Int, coeff: Double): Dataset[GoertzelPower] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val pcm = Wav.decode(rec.payload)
      require(pcm.channels == 1, "goertzelPower is mono-only")
      require(pcm.samples.length >= nSamples,
        s"need $nSamples samples, got ${pcm.samples.length}")
      var s1 = 0.0d; var s2 = 0.0d; var d1 = 0.0d; var d2 = 0.0d
      var i = 0
      while (i < nSamples) {
        val x = pcm.samples(i).toDouble
        val s0 = x + coeff * s1 - s2; s2 = s1; s1 = s0
        val t0 = x + 2.0d * d1 - d2; d2 = d1; d1 = t0
        i += 1
      }
      GoertzelPower(rec.doc_id, nSamples,
        s1 * s1 + s2 * s2 - coeff * s1 * s2,
        d1 * d1 + d2 * d2 - 2.0d * d1 * d2)
    })
  }

  /** Decode the first two frames of each multi-frame payload and emit
    * per-`p`×`p`-block integer moment partials of the grayscale (r+g+b)
    * channels — the inputs of a blockwise SSIM between consecutive frames.
    * One codec-stage pass; whole blocks only (the SSIM crop convention). */
  def ssimBlocks(spark: SparkSession, media: Dataset[MediaRecord],
      p: Int): Dataset[SsimBlock] = {
    import spark.implicits._
    require(p > 0, s"block size must be positive, got $p")
    media.mapPartitions(_.flatMap { rec =>
      val frames = Bmp.splitFrames(rec.payload).take(2)
        .map { case (_, bytes) => Bmp.decode(bytes) }.toArray
      if (frames.length < 2) Iterator.empty
      else {
        val a = frames(0); val b = frames(1)
        def g(img: Bmp.Image, x: Int, y: Int): Long =
          img.r(x, y).toLong + img.g(x, y) + img.b(x, y)
        val bw = a.width / p; val bh = a.height / p
        (0 until bh).iterator.flatMap { by =>
          (0 until bw).iterator.map { bx =>
            var sx = 0L; var sy = 0L; var sxx = 0L; var syy = 0L
            var sxy = 0L
            var y = by * p
            while (y < by * p + p) {
              var x = bx * p
              while (x < bx * p + p) {
                val gx = g(a, x, y); val gy = g(b, x, y)
                sx += gx; sy += gy
                sxx += gx * gx; syy += gy * gy; sxy += gx * gy
                x += 1
              }
              y += 1
            }
            SsimBlock(rec.doc_id, by, bx, p.toLong * p, sx, sy, sxx, syy, sxy)
          }
        }
      }
    })
  }

  /** Frame-sample a multi-frame payload: walk the container (each BMP frame
    * declares its own length), keep every `everyK`-th frame, decode ONLY the
    * kept frames, and emit their pixel statistics. Lazy iterator inside
    * mapPartitions — a huge video row never materializes all frames at once. */
  def frameSample(spark: SparkSession, media: Dataset[MediaRecord],
      everyK: Int): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(everyK > 0, s"everyK must be positive, got $everyK")
    media.mapPartitions(_.flatMap { rec =>
      Bmp.splitFrames(rec.payload)
        .filter { case (idx, _) => idx % everyK == 0 }
        .map { case (idx, frame) =>
          val st = Multimodal.imageStats(rec.doc_id, frame.length.toLong, Bmp.decode(frame))
          FrameFeatures(rec.doc_id, idx, st.width, st.height,
            st.sum_r, st.sum_g, st.sum_b, st.wsum_r)
        }
    })
  }
}
