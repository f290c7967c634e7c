package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** Spec-compliant YUV4MPEG2 (.y4m) codec — the REAL video decode path.
  *
  * Implemented from the PUBLIC yuv4mpeg stream format (the mjpegtools
  * `yuv4mpeg(5)` man page): an ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<num>:<den> I<p> A<n>:<d> C<chroma>\n` followed by
  * one `FRAME\n` marker + planar pixel payload per frame. Supported chroma
  * modes: `C420`/`C420jpeg`/`C420mpeg2`/`C420paldv` (all carry the same
  * 4:2:0 plane sizes — w·h luma + two (w/2)·(h/2) chroma planes) and
  * `C444` (full-size chroma); `Cmono` (luma only). Other modes are
  * rejected as undecodable, never mis-decoded. Frame-level parameter
  * overrides (tokens after `FRAME`) are accepted and ignored, per spec.
  *
  * Why Y4M: it is the one video container that is BOTH public-spec-simple
  * and byte-deterministic (uncompressed planar YUV), so frame sampling,
  * per-frame statistics, and scene-cut detection are exactly
  * oracle-checkable — the same "lossless ⇒ SQL-recomputable" property the
  * PNG codec gives images. Compressed codecs (H.264 etc.) remain
  * environment-limited; they plug into the same blob→frames shape.
  */
object Video {

  /** One decoded frame: the luma plane (w·h bytes, row-major) plus the
    * chroma planes as decoded (empty for mono).
    */
  final case class Frame(y: Array[Byte], u: Array[Byte], v: Array[Byte])

  /** Decoded stream: dimensions, frame rate as an exact rational, and the
    * frames in stream order.
    */
  final case class Stream(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      chroma: String, frames: Vector[Frame])

  private def chromaPlaneSize(chroma: String, w: Int, h: Int): Option[Int] =
    chroma match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
        Some((w / 2) * (h / 2))
      case "444" => Some(w * h)
      case "mono" => Some(0)
      case _ => None
    }

  /** Encode 4:2:0 frames (or mono when `u`/`v` are empty) as a Y4M blob. */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Frame]): Array[Byte] = {
    require(width > 0 && height > 0, "dims must be positive")
    val mono = frames.headOption.forall(_.u.isEmpty)
    val chroma = if (mono) "mono" else "420"
    val cSize = chromaPlaneSize(chroma, width, height).get
    val out = new ByteArrayOutputStream()
    out.write(
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C$chroma\n"
        .getBytes(US_ASCII))
    frames.foreach { f =>
      require(f.y.length == width * height, "luma plane size mismatch")
      require(f.u.length == cSize && f.v.length == cSize,
        "chroma plane size mismatch")
      out.write("FRAME\n".getBytes(US_ASCII))
      out.write(f.y)
      out.write(f.u)
      out.write(f.v)
    }
    out.toByteArray
  }

  /** Decode a Y4M blob; malformed/truncated/unsupported-chroma input is
    * data (`None`), not a task failure — the [[Image.decodePng]] contract.
    */
  def decodeY4m(bytes: Array[Byte]): Option[Stream] = {
    if (bytes == null || bytes.length < 10) return None
    var pos = 0
    def line(): Option[String] = {
      val nl = bytes.indexOf('\n'.toByte, pos)
      // headers are short ASCII; an unterminated or absurd one is corrupt
      if (nl < 0 || nl - pos > 512) None
      else { val s = new String(bytes, pos, nl - pos, US_ASCII); pos = nl + 1; Some(s) }
    }
    val header = line().getOrElse(return None)
    val toks = header.split(' ')
    if (toks.isEmpty || toks(0) != "YUV4MPEG2") return None
    var w = 0; var h = 0; var fn = 30; var fd = 1; var chroma = "420"
    try toks.drop(1).filter(_.nonEmpty).foreach { t =>
      t.charAt(0) match {
        case 'W' => w = t.substring(1).toInt
        case 'H' => h = t.substring(1).toInt
        case 'F' =>
          val Array(a, b) = t.substring(1).split(":", 2); fn = a.toInt; fd = b.toInt
        case 'C' => chroma = t.substring(1)
        case _ => () // I (interlace), A (aspect), X (extensions): ignored
      }
    } catch { case _: RuntimeException => return None }
    if (w <= 0 || h <= 0 || fn <= 0 || fd <= 0) return None
    val cSize = chromaPlaneSize(chroma, w, h).getOrElse(return None)
    val ySize = w * h
    val frames = Vector.newBuilder[Frame]
    while (pos < bytes.length) {
      val marker = line().getOrElse(return None)
      // the spec allows frame-parameter tokens after FRAME; accept & ignore
      if (marker != "FRAME" && !marker.startsWith("FRAME ")) return None
      if (pos + ySize + 2L * cSize > bytes.length) return None
      val y = java.util.Arrays.copyOfRange(bytes, pos, pos + ySize)
      val u = java.util.Arrays.copyOfRange(bytes, pos + ySize, pos + ySize + cSize)
      val v = java.util.Arrays.copyOfRange(bytes, pos + ySize + cSize,
        pos + ySize + 2 * cSize)
      pos += ySize + 2 * cSize
      frames += Frame(y, u, v)
    }
    Some(Stream(w, h, fn, fd, chroma, frames.result()))
  }

  /** Exact per-frame luma statistics: (frame_idx, y_sum). Integer sums so
    * the SQL oracle reproduces them from the synthesis law byte-for-byte.
    */
  def frameLumaSums(s: Stream): Seq[(Int, Long)] =
    s.frames.zipWithIndex.map { case (f, i) =>
      var sum = 0L
      var j = 0
      while (j < f.y.length) { sum += f.y(j) & 0xff; j += 1 }
      (i, sum)
    }

  /** Scene-cut detection: frame f is a cut iff the MEAN absolute luma
    * difference to frame f-1 strictly exceeds `threshold` (integer mean,
    * total-diff · 1 > threshold · pixels — kept as an exact integer
    * comparison, no float division). The standard shot-boundary baseline
    * (pairwise pixel difference); at scale each blob is one partition-local
    * pass, no shuffle.
    */
  def sceneCuts(s: Stream, threshold: Int): Seq[Int] = {
    val px = s.width.toLong * s.height
    (1 until s.frames.length).filter { f =>
      val a = s.frames(f - 1).y
      val b = s.frames(f).y
      var diff = 0L
      var j = 0
      while (j < a.length) {
        diff += math.abs((a(j) & 0xff) - (b(j) & 0xff)); j += 1
      }
      diff > threshold.toLong * px
    }
  }
}
