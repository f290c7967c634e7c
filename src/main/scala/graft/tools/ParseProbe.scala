package graft.tools

import graft.text.Parse._

/** Timing probe for the ambiguous-grammar derive path (frob case). */
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val frob = Grammar(Map(
      "s" -> GOr(GSeq(GRef("s"), GRef("s")), GLit("x" * 4), GLit("x" * 7))),
      "s")
    val ns =
      if (args.nonEmpty) args.toSeq.map(_.toInt)
      else Seq(8, 16, 32, 64, 100, 200, 400, 800, 1600)
    for (n <- ns) {
      val t0 = System.nanoTime()
      val hits = frob.scanExtract("x" * n, Seq("s"))
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[parseprobe] n=$n%4d hits=${hits.size} len=${hits.headOption.map(_._1.length).getOrElse(0)} $ms%10.1f ms")
    }
  }
}
