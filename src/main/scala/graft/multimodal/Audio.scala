package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Spec-compliant WAV (RIFF/WAVE) PCM codec — the REAL audio decode path
  * (no javax.sound dependency; like [[Image]], the pure-JVM codec keeps
  * the decode deterministic and oracle-checkable).
  *
  * Implemented from the PUBLIC RIFF WAVE format (the Microsoft/IBM
  * "Multimedia Programming Interface and Data Specifications 1.0", 1991;
  * also RFC 2361 for the format-tag registry): little-endian `RIFF` framing,
  * a chunk walk that SKIPS unknown chunks (LIST/INFO/fact/cue are data, not
  * errors — real-world WAVs carry them), `fmt ` parsing for integer PCM
  * (format tag 1), and 8/16-bit sample decode (8-bit is unsigned per spec,
  * 16-bit signed little-endian). Float/ADPCM/extensible formats are
  * rejected as undecodable rather than mis-decoded — same contract as
  * [[Image.decodePng]]: a corrupt or exotic blob is data (`None`), never a
  * task failure.
  *
  * Reference behavior: the platform treats audio as opaque blobs sprayed
  * through DFU and processed by external plugins; this codec plus
  * [[Multimodal]]'s batched partition passes give the Spark engine a
  * first-class in-JVM path for the common PCM shape at 100 TB scale
  * (decode is one streamed pass per blob, no global state).
  */
object Audio {

  /** Decoded PCM clip: interleaved signed samples. 16-bit input is verbatim;
    * 8-bit input (unsigned per spec) is centered to (b & 0xff) - 128 and NOT
    * rescaled, keeping checksums exactly derivable from the source bytes.
    * `samples.length = nFrames * channels`; frame i, channel c at
    * `samples(i * channels + c)`.
    */
  final case class Clip(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short]) {
    def nFrames: Int = samples.length / math.max(channels, 1)
  }

  /** Encode 16-bit PCM as a canonical 44-byte-header WAV blob. */
  def encodeWav(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    require(channels >= 1, "channels must be >= 1")
    require(samples.length % channels == 0,
      "sample count must be a multiple of channels")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a WAV blob: chunk-walking RIFF parse, integer PCM only.
    * Unknown chunks are skipped (with the spec's even-byte padding);
    * truncated/corrupt/non-PCM blobs return None.
    */
  def decodeWav(bytes: Array[Byte]): Option[Clip] = {
    if (bytes == null || bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    try {
      if (fourCC() != "RIFF") return None
      buf.getInt // riff size (trust the chunk walk, not this field)
      if (fourCC() != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None     // (offset, length)
      while (buf.remaining() >= 8 && data.isEmpty) {
        val id = fourCC()
        val len = buf.getInt
        if (len < 0 || len > buf.remaining()) return None
        id match {
          case "fmt " =>
            if (len < 16) return None
            val at = buf.position()
            val tag = buf.getShort & 0xffff
            val channels = buf.getShort & 0xffff
            val rate = buf.getInt
            buf.getInt   // byte rate
            buf.getShort // block align
            val bits = buf.getShort & 0xffff
            if (tag != 1 || channels < 1 || rate <= 0 ||
              (bits != 8 && bits != 16)) return None
            fmt = Some((channels, rate, bits))
            buf.position(at + len + (len & 1)) // spec: chunks pad to even
          case "data" =>
            data = Some((buf.position(), len))
          case _ =>
            buf.position(buf.position() + len + (len & 1))
        }
      }
      for ((channels, rate, bits) <- fmt; (off, len) <- data) yield {
        val samples =
          if (bits == 16) {
            val n = len / 2
            val out = new Array[Short](n)
            var i = 0
            while (i < n) { out(i) = buf.getShort(off + 2 * i); i += 1 }
            out
          } else { // 8-bit PCM is unsigned; center to signed per spec
            val out = new Array[Short](len)
            var i = 0
            while (i < len) {
              out(i) = ((bytes(off + i) & 0xff) - 128).toShort; i += 1
            }
            out
          }
        // drop a trailing partial frame rather than misalign channels
        val aligned = samples.length - samples.length % channels
        Clip(rate, channels, bits,
          if (aligned == samples.length) samples else samples.take(aligned))
      }
    } catch { case _: RuntimeException => None }
  }

  /** Exact integer features of a clip — every one reproducible in SQL from
    * a closed-form sample law (no floats, so oracle gates are hash-exact):
    * sum / sum-of-squares / peak over ALL interleaved samples, plus the
    * zero-crossing count of channel 0 (i in [1, nFrames) where the sign
    * bit of s(i-1) differs from s(i); 0 counts as non-negative).
    */
  final case class Features(nFrames: Long, sampleRate: Int, channels: Int,
      sum: Long, sqSum: Long, peak: Int, zeroCrossings: Long)

  def features(c: Clip): Features = {
    var sum = 0L; var sq = 0L; var peak = 0
    var i = 0
    while (i < c.samples.length) {
      val s = c.samples(i).toInt
      sum += s; sq += s.toLong * s
      val a = math.abs(s); if (a > peak) peak = a
      i += 1
    }
    var zc = 0L
    var f = 1
    while (f < c.nFrames) {
      val prev = c.samples((f - 1) * c.channels) < 0
      val cur = c.samples(f * c.channels) < 0
      if (prev != cur) zc += 1
      f += 1
    }
    Features(c.nFrames.toLong, c.sampleRate, c.channels, sum, sq, peak, zc)
  }

  /** Decimating resample: keep every `factor`-th FRAME (all channels of
    * it), new nominal rate = rate / factor. Deterministic integer
    * decimation — like nearest-neighbor resize, chosen over filtered
    * resampling because it is bit-exact and oracle-checkable; production
    * anti-aliased resampling plugs into the same blob→blob shape.
    */
  def decimate(c: Clip, factor: Int): Clip = {
    require(factor >= 1, "factor must be >= 1")
    val keptFrames = (c.nFrames + factor - 1) / factor
    val out = new Array[Short](keptFrames * c.channels)
    var f = 0
    while (f < keptFrames) {
      var ch = 0
      while (ch < c.channels) {
        out(f * c.channels + ch) = c.samples(f * factor * c.channels + ch)
        ch += 1
      }
      f += 1
    }
    Clip(math.max(c.sampleRate / factor, 1), c.channels, c.bitsPerSample, out)
  }
}
