package graft

import graft.multimodal.{Audio, Multimodal, Video}
import org.apache.spark.sql.functions._

/** Audio (WAV/RIFF PCM) and video (YUV4MPEG2) codec specs: byte-exact
  * roundtrips, chunk/parameter tolerance per the public specs, corrupt
  * input as data (None) not failures, and the DataFrame-level batched
  * passes over real encoded blobs.
  */
class MultimodalAvSpec extends SparkSpec {

  // ---- WAV codec -----------------------------------------------------------

  test("WAV: encode/decode roundtrip preserves every sample, rate, channels") {
    val samples = Array.tabulate(300)(i => ((i * 37) % 2048 - 1024).toShort)
    val clip = Audio.decodeWav(Audio.encodeWav(16000, 1, samples)).get
    assert(clip.sampleRate == 16000 && clip.channels == 1 &&
      clip.bitsPerSample == 16)
    assert(clip.samples.toSeq == samples.toSeq)

    val stereo = Array.tabulate(200)(i => (i - 100).toShort)
    val c2 = Audio.decodeWav(Audio.encodeWav(44100, 2, stereo)).get
    assert(c2.channels == 2 && c2.nFrames == 100)
    assert(c2.samples.toSeq == stereo.toSeq)
  }

  test("WAV: chunk walk skips unknown chunks (LIST before data, odd padding)") {
    val wav = Audio.encodeWav(8000, 1, Array[Short](10, -20, 30))
    // splice a 5-byte LIST chunk (odd length → 1 pad byte) after "WAVE"
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 'I', 'N', 'F', 'O', 'x', 0)
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    // patch the RIFF size field (bytes 4-7, little-endian)
    val bb = java.nio.ByteBuffer.wrap(spliced)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val clip = Audio.decodeWav(spliced).get
    assert(clip.samples.toSeq == Seq[Short](10, -20, 30))
  }

  test("WAV: 8-bit PCM is centered; exotic formats and corrupt bytes are None") {
    // hand-build an 8-bit mono file: fmt tag 1, bits 8, data {0, 128, 255}
    val bb = java.nio.ByteBuffer.allocate(47)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(39)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](0, -128, -1)) // unsigned 0, 128, 255
    val clip = Audio.decodeWav(bb.array()).get
    assert(clip.samples.toSeq == Seq[Short](-128, 0, 127))

    val floatFmt = bb.array().clone()
    floatFmt(20) = 3 // format tag 3 = IEEE float → rejected
    assert(Audio.decodeWav(floatFmt).isEmpty)
    assert(Audio.decodeWav("not a wav at all".getBytes("US-ASCII")).isEmpty)
    assert(Audio.decodeWav(Array.empty[Byte]).isEmpty)
    // truncated data chunk length beyond the buffer
    val trunc = Audio.encodeWav(8000, 1, Array[Short](1, 2, 3)).dropRight(2)
    assert(Audio.decodeWav(trunc).isEmpty)
  }

  test("WAV: features and decimation are exact integer functions") {
    val samples = Array[Short](5, -3, 0, -7, 8, 2)
    val f = Audio.features(Audio.decodeWav(Audio.encodeWav(8000, 1, samples)).get)
    assert(f.nFrames == 6 && f.sum == 5 && f.sqSum == 25 + 9 + 0 + 49 + 64 + 4)
    assert(f.peak == 8)
    // sign flips: 5→-3 (y), -3→0 (y: neg→nonneg), 0→-7 (y), -7→8 (y), 8→2 (n)
    assert(f.zeroCrossings == 4)
    val d = Audio.decimate(Audio.decodeWav(Audio.encodeWav(8000, 1, samples)).get, 2)
    assert(d.samples.toSeq == Seq[Short](5, 0, 8) && d.sampleRate == 4000)
    // stereo decimation keeps whole frames
    val st = Audio.decimate(
      Audio.decodeWav(Audio.encodeWav(8000, 2,
        Array[Short](1, 2, 3, 4, 5, 6, 7, 8))).get, 2)
    assert(st.samples.toSeq == Seq[Short](1, 2, 5, 6))
  }

  // ---- Y4M codec -----------------------------------------------------------

  private def frame(w: Int, h: Int, base: Int): Video.Frame = {
    val y = Array.tabulate(w * h)(i => ((base + i) % 256).toByte)
    val c = (w / 2) * (h / 2)
    Video.Frame(y, Array.fill(c)(64.toByte), Array.fill(c)(192.toByte))
  }

  test("Y4M: encode/decode roundtrip preserves planes, dims, frame rate") {
    val frames = Seq(frame(8, 6, 0), frame(8, 6, 50), frame(8, 6, 100))
    val s = Video.decodeY4m(Video.encodeY4m(8, 6, 25, 1, frames)).get
    assert(s.width == 8 && s.height == 6 && s.fpsNum == 25 && s.fpsDen == 1)
    assert(s.frames.length == 3)
    assert(s.frames(1).y.toSeq == frames(1).y.toSeq)
    assert(s.frames(2).u.toSeq == frames(2).u.toSeq)
  }

  test("Y4M: spec tolerance — frame params ignored, C420jpeg accepted; corrupt is None") {
    val base = Video.encodeY4m(4, 4, 30, 1, Seq(frame(4, 4, 7)))
    val asStr = new String(base, "ISO-8859-1")
    // frame-parameter tokens after FRAME are legal per spec
    val withParams = asStr.replace("FRAME\n", "FRAME Ip\n")
      .getBytes("ISO-8859-1")
    assert(Video.decodeY4m(withParams).get.frames.length == 1)
    val jpegChroma = asStr.replace(" C420\n", " C420jpeg\n").getBytes("ISO-8859-1")
    assert(Video.decodeY4m(jpegChroma).get.chroma == "420jpeg")
    // unsupported chroma, bad magic, truncated payload → None
    assert(Video.decodeY4m(asStr.replace(" C420\n", " C411\n")
      .getBytes("ISO-8859-1")).isEmpty)
    assert(Video.decodeY4m("MPEG4 W4 H4\n".getBytes("US-ASCII")).isEmpty)
    assert(Video.decodeY4m(base.dropRight(3)).isEmpty)
  }

  test("Y4M: frame luma sums and scene cuts are exact") {
    // 2 scenes: three identical frames, then three brighter ones
    val a = frame(4, 4, 10)
    val b = frame(4, 4, 200)
    val s = Video.decodeY4m(Video.encodeY4m(4, 4, 25, 1,
      Seq(a, a, a, b, b, b))).get
    val sums = Video.frameLumaSums(s)
    assert(sums.length == 6 && sums(0)._2 == sums(2)._2 &&
      sums(3)._2 == sums(5)._2 && sums(0)._2 != sums(3)._2)
    assert(Video.sceneCuts(s, 8) == Seq(3))
    assert(Video.sceneCuts(s, 100000) == Seq.empty)
  }

  test("Y4M: mono streams decode with empty chroma planes") {
    val y = Array.tabulate(12)(_.toByte)
    val blob = ("YUV4MPEG2 W4 H3 F25:1 Ip A1:1 Cmono\nFRAME\n"
      .getBytes("US-ASCII")) ++ y
    val s = Video.decodeY4m(blob).get
    assert(s.chroma == "mono" && s.frames.head.u.isEmpty)
    assert(s.frames.head.y.toSeq == y.toSeq)
  }

  // ---- DataFrame-level batched passes --------------------------------------

  test("decodeAudio/resampleAudio over real blobs; corrupt rows are -1, not failures") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, Multimodal.synthWav(100, 8000, 1L)),
      org.apache.spark.sql.Row(2L, "garbage".getBytes("US-ASCII"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("wav",
          org.apache.spark.sql.types.BinaryType))))
    val out = Multimodal.decodeAudio(df, "id", "wav")
      .orderBy("id").collect()
    assert(out(0).getLong(1) == 100 && out(0).getInt(2) == 8000)
    // engine-side checksum equals the closed-form law sum
    val lawSum = (0 until 100).map(i => ((31L * i + 17L) % 2048) - 1024).sum
    assert(out(0).getLong(4) == lawSum)
    assert(out(1).getLong(1) == -1)
    val res = Multimodal.resampleAudio(df, "id", "wav", 4)
    assert(res.count() == 1) // corrupt blob dropped from the blob→blob path
  }

  test("decodeVideo/videoFrameLuma/videoSceneCuts over real Y4M blobs") {
    val df = spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(7L, Multimodal.synthY4m(8, 6, 7, 7L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("y4m",
          org.apache.spark.sql.types.BinaryType))))
    val meta = Multimodal.decodeVideo(df, "id", "y4m").collect().head
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 6 && meta.getInt(3) == 7)
    val luma = Multimodal.videoFrameLuma(df, "id", "y4m").collect()
    assert(luma.length == 7)
    // law check for frame 0: sum over (7x + 13y + 7) % 256
    val law0 = (for (y <- 0 until 6; x <- 0 until 8)
      yield (7 * x + 13 * y + 7) % 256).sum.toLong
    assert(luma.find(_.getInt(1) == 0).get.getLong(2) == law0)
    // scene changes at f = 3 and f = 6 (scene = f / 3)
    val cuts = Multimodal.videoSceneCuts(df, "id", "y4m", 8).collect()
      .map(_.getInt(1)).toSeq
    assert(cuts == Seq(3, 6))
  }
}
