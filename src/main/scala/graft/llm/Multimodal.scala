package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media record flowing through the pipeline: an opaque binary payload plus
  * enough typed metadata to route it. */
case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded-image statistics — all integer-exact, so cross-engine hashable. The
  * weighted sum `wsum_r` (Σ (x + 2y + 1)·R over top-down coordinates) is
  * position-SENSITIVE: a decoder that flips row order or swaps channels produces
  * the same plain sums but a different wsum, so the oracle catches it. */
case class ImageFeatures(doc_id: Long, width: Int, height: Int, n_px: Long,
    payload_bytes: Long, sum_r: Long, sum_g: Long, sum_b: Long,
    min_r: Int, max_r: Int, wsum_r: Long)

/** One decoded frame sampled out of a multi-frame (video-shaped) payload. */
case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int, height: Int,
    sum_r: Long, sum_g: Long, sum_b: Long, wsum_r: Long)

/** Energy of one fixed-length audio analysis frame (Σ s² over the frame) —
  * the per-frame feature every energy-gated VAD consumes. Integer-exact. */
case class AudioFrameEnergy(doc_id: Long, frame_idx: Int, energy: Long)

/** Per-patch integer statistics of one p×p image patch (ViT-style patch
  * grid, image cropped to whole patches). */
case class PatchFeatures(doc_id: Long, py: Int, px: Int, n_px: Long,
    sum_r: Long, sum_g: Long, sum_b: Long)

/** Per-image channel sums AND sums of squares — the per-record partials the
  * corpus normalization-constant pass (dataset mean/std per channel)
  * aggregates. Integer-exact. */
case class ChannelStats(doc_id: Long, n_px: Long,
    sum_r: Long, sq_r: Long, sum_g: Long, sq_g: Long, sum_b: Long, sq_b: Long)

/** Decoded-audio statistics — integer-exact, so cross-engine hashable. `energy`
  * is the sum of squared samples (the RMS numerator, kept un-rooted for
  * exactness); `zero_cross` counts sign boundaries, the classic cheap
  * voiced/unvoiced + noisiness signal. */
case class AudioFeatures(doc_id: Long, n_samples: Long, sample_rate: Int,
    sum_s: Long, min_s: Int, max_s: Int, energy: Long, zero_cross: Long)

/** Per-image Sobel gradient statistics over the interior pixels —
  * integer-exact (|gx|+|gy| magnitude, no sqrt). */
case class SobelStats(doc_id: Long, n_interior: Long, sum_mag: Long,
    max_mag: Long, n_edges: Long)

/** Goertzel single-bin spectral power at a target bin and at DC — the
  * cheap tone-detection primitive (DTMF/beep gates) that needs no FFT. */
case class GoertzelPower(doc_id: Long, n: Int, p_target: Double, p_dc: Double)

/** Per-image 3x3 box-blur statistics over the interior pixels — integer
  * truncating division (sum of the 9 grayscale neighbors `div` 9), with a
  * position-weighted checksum that pins kernel addressing. */
case class BlurStats(doc_id: Long, n_interior: Long, sum_blur: Long,
    max_blur: Long, wsum_blur: Long)

/** Per-image ordered-dithering statistics: Bayer 4x4 threshold matrix over
  * the grayscale (r+g+b) field, 1-bit output — on-pixel count plus the
  * position-weighted checksum that pins the matrix addressing. */
case class DitherStats(doc_id: Long, n_pix: Long, n_on: Long, wsum_on: Long)

/** Per-image Otsu threshold pick: the argmax level plus the below-class
  * count/sum at the optimum — integer witnesses that pin the whole scan. */
case class OtsuStats(doc_id: Long, n_pix: Long, t_opt: Int, w0: Long, s0: Long)

/** Per-recording local-maxima statistics above a threshold: peak count,
  * index-sum checksum (pins peak POSITIONS, not just their number), and the
  * loudest peak value. */
case class PeakStats(doc_id: Long, n_samples: Long, n_peaks: Long,
    sum_peak_idx: Long, max_peak: Int)

/** Per-image integral-image (summed-area table) witnesses: the total-mass
  * corner, a center probe, and an interior-rectangle sum evaluated VIA the
  * SAT corner identity — a prefix-sum bug flips it. */
case class IntegralStats(doc_id: Long, n_pix: Long, total: Long,
    center: Long, interior: Long)

/** Per-video block-matching summary between the first two frames: block
  * count, total best-offset SAD, net motion components, and a
  * position-weighted motion checksum that pins WHICH block moved where. */
case class MotionStats(doc_id: Long, n_blocks: Long, sum_sad: Long,
    sum_dx: Long, sum_dy: Long, wsum_mv: Long)

/** Per-image histogram-equalization witnesses: distinct remapped levels,
  * remapped min/max, and the position-weighted remap checksum. */
case class EqualizeStats(doc_id: Long, n_pix: Long, n_levels_out: Long,
    min_out: Int, max_out: Int, wsum_out: Long)

/** Per-image binary-morphology witnesses on the thresholded grayscale
  * field: on-pixel counts after threshold / 3×3 erosion / 3×3 dilation,
  * plus the position-weighted erosion checksum. */
case class MorphStats(doc_id: Long, n_pix: Long, n_on: Long, n_eroded: Long,
    n_dilated: Long, wsum_eroded: Long)

/** One DFT-bin power of one recording (decimal-exact accumulation over the
  * pinned coefficient table). */
case class BinPower(doc_id: Long, bin: Int, power: Double)

/** Per-image 3×3 median-filter witnesses over the interior grayscale
  * field: filtered sum, min/max, and the position-weighted checksum. */
case class MedianStats(doc_id: Long, n_interior: Long, sum_med: Long,
    min_med: Int, max_med: Int, wsum_med: Long)

/** Per-image run-length-encoding audit of the thresholded binary field:
  * total horizontal runs, on-runs, longest on-run, and the 2-byte-per-run
  * RLE size estimate. */
case class RleStats(doc_id: Long, n_pix: Long, n_on: Long, n_runs: Long,
    n_runs_on: Long, max_run_on: Long, rle_bytes: Long)

/** Per-image 3-3-2 palette-quantization witnesses: distinct codes, exact
  * per-channel absolute reconstruction error sums, and the
  * position-weighted code checksum. */
case class QuantStats(doc_id: Long, n_pix: Long, n_codes: Long,
    err_r: Long, err_g: Long, err_b: Long, wsum_code: Long)

/** Per-block integer moment partials between two frames (grayscale sums,
  * sums of squares, cross sum) — everything SSIM needs, kept exact so the
  * downstream SSIM expression is pinned IEEE on exact inputs. */
case class SsimBlock(doc_id: Long, by: Int, bx: Int, n_px: Long,
    sx: Long, sy: Long, sxx: Long, syy: Long, sxy: Long)

case class GammaStats(doc_id: Long, n_pix: Long, n_levels_out: Long,
    min_out: Int, max_out: Int, wsum_out: Long)

case class ClipStats(doc_id: Long, n_samples: Long, n_clipped: Long,
    max_clip_run: Long, first_clip_idx: Long)

case class TileStats(doc_id: Long, ty: Int, tx: Int, n_px: Long,
    n_levels: Long, sum_lv: Long, min_lv: Int, max_lv: Int)

case class EnvelopeStats(doc_id: Long, n_frames: Long, global_peak: Int,
    attack_frame: Long, last_half_frame: Long)

/** Multimodal columns — SURVEY.md §2b "LLM extensions". Media (image/audio/video)
  * is carried as opaque `binary` columns plus a typed metadata struct; decode /
  * feature-extraction / resize / frame-sampling run partition-wise
  * (`mapPartitions` over typed records — the Scala analogue of arrow-batched
  * Python UDFs): the executor streams one partition iterator at a time, so
  * memory stays bounded no matter the table size, and the work parallelizes
  * per-partition with no shuffle.
  *
  * The codec is REAL (see [[Bmp]]): 24-bit uncompressed BMP encode/decode —
  * header parse, little-endian fields, row padding, bottom-up/top-down order,
  * BGR→RGB — runs on every record. Synthetic payloads are generated from an
  * integer formula of (doc_id, frame, x, y) so a DuckDB oracle recomputes the
  * expected pixel statistics without a decoder, making the decode step
  * hash-checkable end-to-end (the round-3 stub is gone).
  *
  * Mirrors the reference's image archetype (reference/README.md:53-77): images
  * as binary payloads produced and consumed by pipeline tasks. */
object Multimodal extends MultimodalFilters {

  /** Attach a binary payload + typed metadata struct to the documents table (the
    * text bytes stand in for undecodable media bytes). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("text/plain").as("media_type"),
      struct(
        col("source").as("source"),
        col("n_chars").as("n_chars"),
        sha2(col("text").cast("binary"), 256).as("checksum")).as("meta"))

  /** Average-hash (aHash) perceptual fingerprint of one decoded image: resize
    * to 8x8 (nearest), set bit (y*8+x) iff 64*R(x,y) >= sum of all 64 R values
    * (integer compare — no float mean), packed 32 bits per long word. */
  def averageHash(img: Bmp.Image): (Long, Long) = {
    val small = Bmp.resizeNearest(img, 8, 8)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += small.r(i % 8, i / 8); i += 1 }
    var w0 = 0L; var w1 = 0L
    i = 0
    while (i < 64) {
      if (64L * small.r(i % 8, i / 8) >= sum) {
        if (i < 32) w0 |= (1L << i) else w1 |= (1L << (i - 32))
      }
      i += 1
    }
    (w0, w1)
  }

  /** Partition-wise perceptual hashing over an image corpus: decode (real
    * codec), resize, aHash — the near-duplicate-image fingerprint pass. */
  def perceptualHashes(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val (w0, w1) = averageHash(Bmp.decode(rec.payload))
      (rec.doc_id, w0, w1)
    })
  }

  /** Deterministic single-image corpus: one BMP per doc_id, dims varying with
    * doc_id so every row-padding case (0..3 pad bytes) is exercised. Generated
    * partition-wise on executors — no driver-side materialization. */
  def syntheticImages(spark: SparkSession, docIds: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docIds.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val w = (16 + id % 8).toInt
      val h = (12 + id % 5).toInt
      MediaRecord(id, "image/bmp", Bmp.encode(Bmp.synthetic(id, 0, w, h)))
    })
  }

  /** Deterministic MIXED-format corpus: even doc_ids encode as BMP, odd as
    * binary P6 PPM — same pixel formula and dims either way, so the decode
    * dispatch (not the content) is what differs per record. */
  def syntheticMixedImages(spark: SparkSession,
      docIds: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docIds.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val w = (16 + id % 8).toInt
      val h = (12 + id % 5).toInt
      val img = Bmp.synthetic(id, 0, w, h)
      if (id % 2 == 0) MediaRecord(id, "image/bmp", Bmp.encode(img))
      else MediaRecord(id, "image/x-portable-pixmap", Ppm.encode(img))
    })
  }

  /** media_type-routed decode — the multi-codec registry every real multimodal
    * pipeline has. Unknown types fail loudly (a silent skip would turn a
    * mis-tagged corpus into quietly-wrong statistics). */
  def decodeAny(mediaType: String, payload: Array[Byte]): Bmp.Image =
    mediaType match {
      case "image/bmp" => Bmp.decode(payload)
      case "image/x-portable-pixmap" => Ppm.decode(payload)
      case other => throw new IllegalArgumentException(
        s"no image codec registered for media_type '$other'")
    }

  /** Partition-wise dispatch decode + feature extraction over a mixed-format
    * corpus (see [[syntheticMixedImages]]). */
  def extractFeaturesDispatch(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      imageStats(rec.doc_id, rec.payload.length.toLong,
        decodeAny(rec.media_type, rec.payload))
    })
  }

  /** Deterministic multi-frame corpus: 3..6 concatenated BMP frames per doc
    * (each frame self-describes its byte length — the container walk in
    * [[Bmp.splitFrames]] is real parsing, not fixed-stride splitting). */
  def syntheticVideos(spark: SparkSession, docIds: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docIds.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val w = (12 + id % 6).toInt
      val h = (10 + id % 5).toInt
      val nFrames = (3 + id % 4).toInt
      val bos = new java.io.ByteArrayOutputStream()
      (0 until nFrames).foreach { f =>
        bos.write(Bmp.encode(Bmp.synthetic(id, f, w, h)))
      }
      MediaRecord(id, "video/x-bmp-seq", bos.toByteArray)
    })
  }

  /** Deterministic audio corpus: one 16-bit PCM WAV per doc_id, length and
    * sample rate varying with doc_id. Generated partition-wise on executors. */
  def syntheticAudio(spark: SparkSession, docIds: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docIds.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val n = (800 + (id % 7) * 100).toInt
      val rate = (8000 + (id % 3) * 4000).toInt
      MediaRecord(id, "audio/wav", Wav.encode(Wav.synthetic(id, n, rate)))
    })
  }

  /** Decode → per-image channel sums and sums of squares, the map-side
    * partials of the corpus normalization pass (every vision pipeline's
    * per-channel mean/std constants). One codec-stage pass, no shuffle. */
  def channelStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[ChannelStats] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      var sr = 0L; var qr = 0L; var sg = 0L; var qg = 0L
      var sb = 0L; var qb = 0L
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val r = img.r(x, y).toLong; val g = img.g(x, y).toLong
          val b = img.b(x, y).toLong
          sr += r; qr += r * r; sg += g; qg += g * g; sb += b; qb += b * b
          x += 1
        }
        y += 1
      }
      ChannelStats(rec.doc_id, img.width.toLong * img.height,
        sr, qr, sg, qg, sb, qb)
    })
  }

  /** Decode → per-image channel histogram partials (`bins` equal-width bins
    * over 0..255). Emits (channel, bin, cnt) rows per image — bounded
    * (3·bins) rows per record, summed corpus-wide by one bounded-state agg
    * downstream. The exposure/clipping QA pass of an image pipeline. */
  def channelHistogram(spark: SparkSession, media: Dataset[MediaRecord],
      bins: Int): Dataset[(Long, String, Int, Long)] = {
    import spark.implicits._
    require(bins > 0 && 256 % bins == 0, s"bins must divide 256, got $bins")
    val width = 256 / bins
    media.mapPartitions(_.flatMap { rec =>
      val img = Bmp.decode(rec.payload)
      val h = Array.ofDim[Long](3, bins)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          h(0)(img.r(x, y) / width) += 1
          h(1)(img.g(x, y) / width) += 1
          h(2)(img.b(x, y) / width) += 1
          x += 1
        }
        y += 1
      }
      val names = Array("r", "g", "b")
      for (c <- (0 until 3).iterator; b <- (0 until bins).iterator
           if h(c)(b) > 0)
        yield (rec.doc_id, names(c), b, h(c)(b))
    })
  }

  /** Decode → crop to whole `p`×`p` patches (the ViT convention: resize/crop
    * to a multiple of the patch size, here crop) → per-patch integer channel
    * sums. The patch grid is the unit every vision-transformer pipeline
    * tokenizes on; emitting per-patch stats partition-wise keeps the decode
    * and the patch reduction in one pass with no shuffle. */
  def imagePatches(spark: SparkSession, media: Dataset[MediaRecord],
      p: Int): Dataset[PatchFeatures] = {
    import spark.implicits._
    require(p > 0, s"patch size must be positive, got $p")
    media.mapPartitions(_.flatMap { rec =>
      val img = Bmp.decode(rec.payload)
      val pw = img.width / p
      val ph = img.height / p
      (0 until ph).iterator.flatMap { py =>
        (0 until pw).iterator.map { px =>
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = py * p
          while (y < py * p + p) {
            var x = px * p
            while (x < px * p + p) {
              sr += img.r(x, y); sg += img.g(x, y); sb += img.b(x, y)
              x += 1
            }
            y += 1
          }
          PatchFeatures(rec.doc_id, py, px, p.toLong * p, sr, sg, sb)
        }
      }
    })
  }

  /** Zero-pad an image with a uniform black border of `px` pixels. */
  private def padBlack(img: Bmp.Image, px: Int): Bmp.Image = {
    val w2 = img.width + 2 * px
    val h2 = img.height + 2 * px
    val rgb = new Array[Byte](w2 * h2 * 3)
    var y = 0
    while (y < img.height) {
      System.arraycopy(img.rgb, y * img.width * 3, rgb,
        ((y + px) * w2 + px) * 3, img.width * 3)
      y += 1
    }
    Bmp.Image(w2, h2, rgb)
  }

  /** Image corpus where EVEN ids carry a 2-pixel black letterbox border and
    * odd ids none — fixture for border detection (the synthetic interior
    * never forms an all-black row/column, so detection is unambiguous). */
  def syntheticBorderedImages(spark: SparkSession,
      docIds: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docIds.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val w = (16 + id % 8).toInt
      val h = (12 + id % 5).toInt
      val img = Bmp.synthetic(id, 0, w, h)
      val out = if (id % 2 == 0) padBlack(img, 2) else img
      MediaRecord(id, "image/bmp", Bmp.encode(out))
    })
  }

  /** Letterbox/border detection: widths of the uniform-black margins on each
    * side (the screenshot/video-frame crop preprocessing). Pure pixel scans
    * inside the codec stage. */
  def borderWidths(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[(Long, Int, Int, Int, Int)] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val img = Bmp.decode(rec.payload)
      def rowBlack(y: Int): Boolean =
        (0 until img.width).forall(x =>
          img.r(x, y) == 0 && img.g(x, y) == 0 && img.b(x, y) == 0)
      def colBlack(x: Int): Boolean =
        (0 until img.height).forall(y =>
          img.r(x, y) == 0 && img.g(x, y) == 0 && img.b(x, y) == 0)
      val top = (0 until img.height).takeWhile(rowBlack).size
      val bottom = (img.height - 1 to 0 by -1).takeWhile(rowBlack).size
      val left = (0 until img.width).takeWhile(colBlack).size
      val right = (img.width - 1 to 0 by -1).takeWhile(colBlack).size
      (rec.doc_id, top, bottom, left, right)
    })
  }

  /** Deterministic STEREO audio corpus: interleaved 2-channel PCM where the
    * left channel runs the standard mod-ramp and the right a shifted one —
    * the interleaving fixture (channel-deinterleave bugs are the classic
    * multi-channel codec error). */
  def syntheticStereoAudio(spark: SparkSession,
      docIds: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docIds.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val n = (400 + (id % 5) * 100).toInt
      val rate = 16000
      val samples = new Array[Short](2 * n)
      var i = 0
      while (i < n) {
        samples(2 * i) =
          (((id * 37 + i.toLong * 13) % 2048L) - 1024L).toShort
        samples(2 * i + 1) =
          ((((id + 7) * 37 + i.toLong * 13) % 2048L) - 1024L).toShort
        i += 1
      }
      MediaRecord(id, "audio/wav",
        Wav.encode(Wav.Pcm(rate, 2, samples)))
    })
  }

  /** Per-channel statistics of interleaved multi-channel audio: decode, then
    * stride the interleaved samples per channel. One codec-stage pass. */
  def stereoChannelStats(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[(Long, Int, Long, Long, Long)] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap { rec =>
      val pcm = Wav.decode(rec.payload)
      val nCh = pcm.channels
      val nFrames = pcm.samples.length / nCh
      (0 until nCh).iterator.map { c =>
        var sum = 0L; var energy = 0L
        var j = 0
        while (j < nFrames) {
          val v = pcm.samples(j * nCh + c).toLong
          sum += v; energy += v * v
          j += 1
        }
        (rec.doc_id, c, nFrames.toLong, sum, energy)
      }
    })
  }

  /** Decode → rotate 90° cw → horizontal mirror → re-encode: a deterministic
    * augmentation pipeline stage (the composition happens to be the matrix
    * TRANSPOSE, which gives the oracle a closed form). Partition-wise. */
  def rotateFlip(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      rec.copy(payload = Bmp.encode(
        Bmp.flipHorizontal(Bmp.rotate90(Bmp.decode(rec.payload)))))
    })
  }

  /** Deterministic speech-shaped audio corpus: [[Wav.syntheticGated]] payloads
    * (every third 200-sample block attenuated) so energy gating is
    * non-vacuous. Same dims formula as [[syntheticAudio]]. */
  def syntheticGatedAudio(spark: SparkSession, docIds: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docIds.select(col("doc_id")).as[Long].mapPartitions(_.map { id =>
      val n = (800 + (id % 7) * 100).toInt
      val rate = (8000 + (id % 3) * 4000).toInt
      MediaRecord(id, "audio/wav", Wav.encode(Wav.syntheticGated(id, n, rate)))
    })
  }

  /** Decode → frame into fixed `frameLen`-sample windows (full frames only;
    * the sub-frame tail is dropped, the standard analysis-frame convention) →
    * per-frame energy Σ s². Emits one row per frame, partition-wise: the codec
    * stage reduces samples to frames BEFORE anything hits a shuffle, so the
    * row count leaving the decoder is n/frameLen, not n. */
  def frameEnergies(spark: SparkSession, media: Dataset[MediaRecord],
      frameLen: Int): Dataset[AudioFrameEnergy] = {
    import spark.implicits._
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    media.mapPartitions(_.flatMap { rec =>
      val pcm = Wav.decode(rec.payload)
      val nFrames = pcm.samples.length / frameLen
      (0 until nFrames).iterator.map { f =>
        var e = 0L
        var i = f * frameLen
        val end = i + frameLen
        while (i < end) { val s = pcm.samples(i).toLong; e += s * s; i += 1 }
        AudioFrameEnergy(rec.doc_id, f, e)
      }
    })
  }

  /** Partition-wise REAL audio decode + integer feature extraction: RIFF chunk
    * walk, PCM sample parse, then sum/extrema/energy/zero-crossings. */
  def extractAudioFeatures(spark: SparkSession,
      media: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      val pcm = Wav.decode(rec.payload)
      var sum = 0L; var energy = 0L; var zc = 0L
      var minS = Short.MaxValue.toInt; var maxS = Short.MinValue.toInt
      var i = 0
      while (i < pcm.samples.length) {
        val s = pcm.samples(i).toInt
        sum += s; energy += s.toLong * s
        if (s < minS) minS = s
        if (s > maxS) maxS = s
        if (i > 0 && ((s >= 0) != (pcm.samples(i - 1) >= 0))) zc += 1
        i += 1
      }
      AudioFeatures(rec.doc_id, pcm.samples.length.toLong, pcm.sampleRate,
        sum, minS, maxS, energy, zc)
    })
  }

  /** Decode → FIR low-pass (7-tap triangular, integer-exact) → decimate by
    * `k` → re-encode: the anti-aliased resample leg (see [[Wav.firDecimate]]),
    * partition-wise like every other codec stage. */
  def firDecimateAudio(spark: SparkSession, media: Dataset[MediaRecord],
      k: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      rec.copy(payload = Wav.encode(Wav.firDecimate(Wav.decode(rec.payload), k)))
    })
  }

  /** Decode → decimate by `k` → re-encode: the integer-exact downsample leg of
    * the audio pipeline, partition-wise like every other codec stage. */
  def decimateAudio(spark: SparkSession, media: Dataset[MediaRecord],
      k: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      rec.copy(payload = Wav.encode(Wav.decimate(Wav.decode(rec.payload), k)))
    })
  }

  private[llm] def imageStats(docId: Long, payloadBytes: Long, img: Bmp.Image): ImageFeatures = {
    var sr = 0L; var sg = 0L; var sb = 0L; var ws = 0L
    var minR = 255; var maxR = 0
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        val r = img.r(x, y)
        sr += r; sg += img.g(x, y); sb += img.b(x, y)
        ws += (x + 2L * y + 1L) * r
        if (r < minR) minR = r
        if (r > maxR) maxR = r
        x += 1
      }
      y += 1
    }
    ImageFeatures(docId, img.width, img.height, img.width.toLong * img.height,
      payloadBytes, sr, sg, sb, minR, maxR, ws)
  }

  /** Partition-wise REAL decode + integer feature extraction: parse the BMP
    * header, undo padding/row-order/BGR, compute per-channel statistics. */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRecord]): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      imageStats(rec.doc_id, rec.payload.length.toLong, Bmp.decode(rec.payload))
    })
  }

  /** Decode → nearest-neighbor resample to `w2`×`h2` → re-encode. The full
    * thumbnail pipeline (decode, resample, encode) per record, partition-wise. */
  def resize(spark: SparkSession, media: Dataset[MediaRecord], w2: Int, h2: Int): Dataset[MediaRecord] = {
    import spark.implicits._
    media.mapPartitions(_.map { rec =>
      rec.copy(payload = Bmp.encode(Bmp.resizeNearest(Bmp.decode(rec.payload), w2, h2)))
    })
  }

}
