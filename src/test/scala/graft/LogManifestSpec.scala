package graft

import graft.sources.{FileCatalog, LogManifest}

/** The incremental-log manifest engine: O(delta) commits over the
  * VersionedManifest claim protocol — record tagging, compaction,
  * legacy-snapshot interop, crash-claim handling, GC-with-chain, and the
  * concurrent-committer election (SURVEY §2.13 Std.File catalog; the Dali
  * analog is the incrementally-updated SDS tree `dali/base/dadfs.hpp:493`
  * backed by its transaction log).
  */
class LogManifestSpec extends SparkSpec {

  private def newRoot(tag: String): String =
    s"/root/repo/target/graft_io/logmanifest_spec/$tag-${System.nanoTime()}"

  /** Trivial state for engine-level tests: an append-only token vector. */
  private def newManifest(dir: String, compactEvery: Int = 16) =
    new LogManifest[Vector[String], String](spark, dir,
      Vector.empty,
      s => s.split("\n").filter(_.nonEmpty).toVector,
      _.mkString("\n"),
      identity, identity,
      (s, o) => s :+ o,
      _.size,
      compactEvery)

  private def fileText(dir: String, name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, name)), "UTF-8")

  private def versionFiles(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".txt"))
      .sorted.toSeq

  test("first commit snapshots; singles append #DELTA records; compaction " +
      "writes a fresh #FULL once replay depth hits the bound") {
    val root = newRoot("compact")
    val m = newManifest(root)
    m.commit(_ => Seq("a"))
    assert(fileText(root, versionFiles(root).head).startsWith("#FULL"),
      "first commit must seed the chain with a snapshot")
    (1 to 10).foreach(i => m.commit(_ => Seq(s"x$i")))
    val afterTen = versionFiles(root)
    assert(afterTen.size == 11)
    assert(fileText(root, afterTen.last).startsWith("#DELTA"),
      "single-op commits must be O(delta) records, not snapshots")
    val (_, base1, since1) = m.chainInfo()
    assert(base1 == 0 && since1 == 10, s"base=$base1 since=$since1")
    // push past the compaction bound (max(16, size/8) = 16 here)
    (11 to 20).foreach(i => m.commit(_ => Seq(s"x$i")))
    val (_, base2, since2) = m.chainInfo()
    assert(base2 > 0, "no compaction snapshot was written")
    assert(since2 < 16, s"replay depth not reset by compaction: $since2")
    assert(fileText(root, f"v$base2%016d.txt").startsWith("#FULL"))
    // a COLD reader (fresh instance, empty cache) replays to the same state
    val cold = newManifest(root)
    assert(cold.load() == m.load())
    assert(cold.load() == "a" +: (1 to 20).map(i => s"x$i").toVector)
  }

  test("legacy untagged VersionedManifest snapshots read unchanged, and " +
      "delta commits stack on top of them") {
    val root = newRoot("legacy")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, f"v${0L}%016d.txt"),
      "a\nb\n#END".getBytes("UTF-8"))
    val m = newManifest(root)
    assert(m.load() == Vector("a", "b"))
    m.commit(_ => Seq("c"))
    assert(fileText(root, f"v${1L}%016d.txt").startsWith("#DELTA"))
    assert(newManifest(root).load() == Vector("a", "b", "c"))
  }

  test("a crashed (unterminated) newest claim is invisible to readers and " +
      "expired committers claim PAST it, never over it") {
    val root = newRoot("crash")
    val m = newManifest(root)
    m.commit(_ => Seq("a"))
    m.commit(_ => Seq("b"))
    // simulate a committer that died mid-stream at v2: claim, no #END
    val crashed = java.nio.file.Paths.get(root, f"v${2L}%016d.txt")
    java.nio.file.Files.write(crashed, "#DELTA\nzzz".getBytes("UTF-8"))
    assert(newManifest(root).load() == Vector("a", "b"),
      "unterminated claim leaked into a read")
    // age it past staleClaimMs so the next committer expires it
    crashed.toFile.setLastModified(System.currentTimeMillis() - 120000L)
    m.commit(_ => Seq("c"))
    assert(java.nio.file.Files.exists(crashed),
      "expired claim must be claimed PAST, not overwritten")
    assert(fileText(root, f"v${3L}%016d.txt").contains("c"))
    assert(newManifest(root).load() == Vector("a", "b", "c"),
      "the crashed claim's junk op replayed into the state")
  }

  test("concurrent committers never lose an op (delta-claim election)") {
    val root = newRoot("race")
    val m = newManifest(root)
    val threads = (1 to 4).map { i =>
      new Thread {
        override def run(): Unit =
          (1 to 10).foreach(j => m.commit(_ => Seq(s"t$i-$j")))
      }
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val expect = (for (i <- 1 to 4; j <- 1 to 10) yield s"t$i-$j").toSet
    assert(m.load().toSet == expect)
    // and a cold reader agrees (the committed CHAIN carries every op)
    assert(newManifest(root).load().toSet == expect)
  }

  test("GC keeps the live chain: after many commits the dir is bounded " +
      "and a cold reader still reconstructs the full state") {
    val root = newRoot("gc")
    val m = newManifest(root)
    (1 to 100).foreach(i => m.commit(_ => Seq(s"x$i")))
    val files = versionFiles(root)
    assert(files.size <= 52, s"catalog dir not pruned: ${files.size}")
    assert(newManifest(root).load() == (1 to 100).map(i => s"x$i").toVector)
  }

  test("FileCatalog survives a cold reload across mixed delta ops " +
      "(cascading delete, rename, promote all replay from the log)") {
    val root = newRoot("filecat")
    val cat = new FileCatalog(spark, root)
    (1 to 5).foreach(i => cat.register(s"f$i", s"/tmp/p$i"))
    cat.createSuperFile("gen1"); cat.createSuperFile("gen2")
    cat.addSuperFile("gen1", "f1"); cat.addSuperFile("gen1", "f2")
    cat.addSuperFile("gen2", "f3")
    cat.setFileDescription("f4", "keep me")
    cat.rename("f5", "f5renamed")
    cat.delete("f2") // cascades out of gen1
    cat.promoteSuperFileList(Seq("gen1", "gen2"), addHead = Some("f4"))
    val cold = new FileCatalog(spark, root)
    assert(cold.list("*") == Seq("f1", "f3", "f4", "f5renamed"))
    assert(cold.superFileContents("gen1") == Seq("f4"))
    assert(cold.superFileContents("gen2") == Seq("f1"))
    assert(cold.fileDescription("f4") == "keep me")
  }
}
