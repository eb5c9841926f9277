package graft.llm

/** Minimal, real, pure-JVM WAV (RIFF PCM) codec: 16-bit little-endian PCM, the
  * uncompressed audio interchange format — the audio leg of the multimodal
  * family next to [[Bmp]]. The decoder is a real RIFF chunk WALK: it validates
  * the RIFF/WAVE preamble, iterates chunks by their self-declared sizes
  * (skipping unknown ones like LIST/INFO metadata, honoring the odd-size pad
  * byte RIFF requires), and only then parses `fmt ` and `data` — so chunk
  * arithmetic, not just happy-path offsets, is exercised on every record.
  *
  * Mirrors the reference's media archetype (reference/README.md:53-77): opaque
  * binary payloads produced and consumed by pipeline tasks, decoded
  * partition-wise on executors. Compressed codecs would slot in behind the same
  * [[Pcm]] interface; PCM keeps the codec dependency-free per the environment
  * constraint (no audio libraries in the container). */
object Wav {

  /** Decoded audio: interleaved 16-bit samples. */
  final case class Pcm(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Encode as a canonical 44-byte-header RIFF/WAVE file (PCM, 16-bit LE). */
  def encode(pcm: Pcm): Array[Byte] = {
    val dataBytes = pcm.samples.length * 2
    val out = new Array[Byte](44 + dataBytes)
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
    @inline def tag(off: Int, s: String): Unit =
      s.indices.foreach(i => out(off + i) = s.charAt(i).toByte)
    tag(0, "RIFF"); le32(4, 36 + dataBytes); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16)
    le16(20, 1)                                  // PCM
    le16(22, pcm.channels)
    le32(24, pcm.sampleRate)
    le32(28, pcm.sampleRate * pcm.channels * 2)  // byte rate
    le16(32, pcm.channels * 2)                   // block align
    le16(34, 16)                                 // bits/sample
    tag(36, "data"); le32(40, dataBytes)
    var i = 0
    while (i < pcm.samples.length) {
      le16(44 + i * 2, pcm.samples(i) & 0xffff)
      i += 1
    }
    out
  }

  @inline private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  @inline private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tagAt(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Decode a RIFF/WAVE byte array: real chunk walk, 16-bit PCM only. Unknown
    * chunks (LIST, fact, cue, ...) are skipped by their declared size with
    * RIFF's odd-size pad byte honored. */
  def decode(bytes: Array[Byte]): Pcm = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(tagAt(bytes, 0) == "RIFF" && tagAt(bytes, 8) == "WAVE",
      "bad RIFF/WAVE magic")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length) {
      val ctag = tagAt(bytes, off)
      val csize = i32(bytes, off + 4)
      require(csize >= 0 && off + 8 + csize <= bytes.length,
        s"corrupt chunk '$ctag' at $off: declared $csize of ${bytes.length}")
      ctag match {
        case "fmt " =>
          val fmt = u16(bytes, off + 8)
          require(fmt == 1, s"unsupported WAV format $fmt (PCM only)")
          channels = u16(bytes, off + 10)
          sampleRate = i32(bytes, off + 12)
          val bps = u16(bytes, off + 22)
          require(bps == 16, s"unsupported bit depth $bps (16-bit only)")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt chunk")
          val n = csize / 2
          samples = new Array[Short](n)
          var i = 0
          while (i < n) {
            samples(i) = u16(bytes, off + 8 + i * 2).toShort
            i += 1
          }
        case _ => () // LIST/fact/cue/...: metadata, skipped by size
      }
      off += 8 + csize + (csize & 1) // RIFF pads odd chunks to even offsets
    }
    require(samples != null, "no data chunk")
    Pcm(sampleRate, channels, samples)
  }

  /** Decimating resample: keep every `k`-th sample (the integer-exact
    * downsample; a production pipeline would low-pass first — that filter is a
    * float convolution with no cross-engine-exact oracle, so the pipeline
    * exposes the exact decimation step). */
  def decimate(pcm: Pcm, k: Int): Pcm = {
    require(k > 0, s"bad decimation factor $k")
    val n = (pcm.samples.length + k - 1) / k
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = pcm.samples(i * k); i += 1 }
    Pcm(pcm.sampleRate / k, pcm.channels, out)
  }

  /** Deterministic synthetic signal: sample i of doc d is an integer formula
    * (a mod-ramp centered on zero — sign changes and full dynamic range, no
    * trig), so a SQL oracle recomputes expected sample statistics without any
    * decoder; any chunk-walk or sample-parse error is a hash mismatch. */
  def synthetic(docId: Long, n: Int, sampleRate: Int): Pcm = {
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      s(i) = (((docId * 37 + i.toLong * 13) % 2048L) - 1024L).toShort
      i += 1
    }
    Pcm(sampleRate, 1, s)
  }

  /** FIR low-pass + decimate — the PROPER integer resampler next to the
    * naive [[decimate]]: convolve with the symmetric 7-tap triangular kernel
    * [1,2,3,4,3,2,1]/16 (valid mode — no edge padding), keep every k-th
    * output. Integer taps keep the whole pipeline exact: accumulate in Long,
    * one truncating /16 per output sample (the same TRUNC semantics as
    * DuckDB's `//`, negative inputs included). */
  def firDecimate(pcm: Pcm, k: Int): Pcm = {
    require(k > 0, s"decimation factor must be positive, got $k")
    // Convolving the raw interleaved array would mix channels; mono only.
    require(pcm.channels == 1,
      s"firDecimate is mono-only (got ${pcm.channels} channels) — " +
        "deinterleave per channel before convolving")
    val taps = Array(1L, 2L, 3L, 4L, 3L, 2L, 1L)
    val n = pcm.samples.length
    val nOut = if (n < 7) 0 else (n - 7) / k + 1
    val out = new Array[Short](nOut)
    var m = 0
    while (m < nOut) {
      var acc = 0L
      var j = 0
      while (j < 7) { acc += taps(j) * pcm.samples(m * k + j); j += 1 }
      out(m) = (acc / 16L).toShort
      m += 1
    }
    Pcm(pcm.sampleRate / k, pcm.channels, out)
  }

  /** Speech-shaped synthetic signal: the [[synthetic]] mod-ramp with every
    * third 200-sample block attenuated 16× (integer TRUNC division, the same
    * semantics as DuckDB's `//`) — deterministic loud/quiet structure so
    * energy-gated segmentation (VAD) has real boundaries to find instead of a
    * uniformly-loud ramp where every frame trivially passes the gate. */
  def syntheticGated(docId: Long, n: Int, sampleRate: Int): Pcm = {
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      val base = ((docId * 37 + i.toLong * 13) % 2048L) - 1024L
      s(i) = (if ((i / 200) % 3 == 2) base / 16L else base).toShort
      i += 1
    }
    Pcm(sampleRate, 1, s)
  }
}
