package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The claim-protocol primitives shared by [[VersionedManifest]] and
  * [[LogManifest]] — ONE copy of the concurrency-critical election code
  * (version-file naming/listing and atomic claim-with-content), so a
  * protocol fix can never land in one engine and silently miss the other.
  */
private[sources] object ManifestIo {

  def versionOf(p: Path): Long = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".txt"))
      try n.substring(1, n.length - 4).toLong catch { case _: Exception => -1L }
    else -1L
  }

  def versionFile(dir: Path, v: Long) = new Path(dir, f"v$v%016d.txt")

  /** All claimed version numbers under `dir`, descending (valid or not). */
  def claimedVersions(fs: FileSystem, dir: Path): Seq[Long] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).map(s => versionOf(s.getPath))
      .filter(_ >= 0).sorted.reverse.toSeq

  /** Atomic claim WITH content. Local filesystems write the full manifest
    * to a temp file first and claim via `Files.createLink` (POSIX link(2)
    * — atomic AND exclusive, claimed WITH content), so a claim can never
    * exist without its content: there is no window where a paused
    * committer holds a contentless claim that a peer could expire and
    * supersede (the lost-update hazard of claim-then-write). Other schemes
    * use the filesystem's exclusive `create(overwrite=false)` and stream
    * content after the claim; there the `#END` guard + stale-claim expiry
    * apply, and commit success is NOT durable if the committer stalls
    * longer than the engine's `staleClaimMs` between claiming and
    * finishing the stream (documented contract).
    */
  def claimAndWrite(fs: FileSystem, p: Path, content: String): Boolean = {
    val scheme = Option(p.toUri.getScheme)
      .orElse(Option(fs.getUri.getScheme)).getOrElse("file")
    if (scheme == "file") {
      val target = new java.io.File(
        Option(p.toUri.getPath).getOrElse(p.toString))
      val tmp = java.io.File.createTempFile("claim-", ".tmp",
        target.getParentFile)
      try {
        java.nio.file.Files.write(tmp.toPath, content.getBytes(UTF_8))
        try { java.nio.file.Files.createLink(target.toPath, tmp.toPath); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } finally tmp.delete()
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(content.getBytes(UTF_8)) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }
}

/** The catalog commit engine, factored out of [[FileCatalog]] so other
  * metadata services (the [[Store]] KV service) share one proven
  * concurrency story instead of inventing their own.
  *
  * State is a single versioned manifest under `dir`: `v<seq>.txt`, each
  * holding the FULL rendered state terminated by an `#END` line. A commit
  * atomically CLAIMS the next version number (POSIX `link(2)` via
  * `Files.createLink` on local filesystems — atomic AND exclusive, claimed
  * WITH content; `FileSystem.create(overwrite=false)` elsewhere) and a
  * lost race replays the pure `mutate` function against the fresher
  * version. Readers take the newest `#END`-complete manifest, so a crashed
  * half-written claim is invisible; committers expire such claims after
  * `staleClaimMs` and claim past them.
  *
  * This is an optimistic-concurrency design for LOW-RATE metadata commits
  * (file registrations, KV config writes) — not a data path. At 100 TB the
  * data lives in parquet; the manifest stays O(entries) and versions are
  * pruned to the last [[gcKeepVersions]].
  */
private[graft] final class VersionedManifest[S](
    spark: SparkSession,
    dirPath: String,
    emptyState: => S,
    parse: String => S,
    render: S => String) {

  private val dir = new Path(dirPath)
  private def fs: FileSystem =
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val EndMarker = "#END"
  /** A claimed-but-unterminated manifest older than this is a crashed
    * committer's junk: readers already skip it; committers claim past it.
    */
  private val staleClaimMs = 60000L

  /** Old manifests kept after a commit. The margin covers readers that
    * listed versions just before a burst of commits; beyond it, history is
    * garbage (the newest valid manifest is the whole state).
    */
  private val gcKeepVersions = 32L

  private def versionFile(v: Long) = ManifestIo.versionFile(dir, v)

  /** All claimed version numbers, descending (valid or not). */
  private def claimedVersions(): Seq[Long] =
    ManifestIo.claimedVersions(fs, dir)

  /** Manifest content iff the file is complete (`#END`-terminated). */
  private def readValid(v: Long): Option[String] = {
    val p = versionFile(v)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val t = text.stripLineEnd
    if (t == EndMarker || t.endsWith("\n" + EndMarker))
      Some(t.stripSuffix(EndMarker)) else None
  }

  /** Newest complete state (crashed half-written claims are skipped). */
  def load(): S =
    claimedVersions().iterator.flatMap(readValid).map(parse).nextOption()
      .getOrElse(emptyState)

  private def renderFull(s: S): String = {
    val body = render(s)
    if (body.isEmpty) EndMarker else body + "\n" + EndMarker
  }

  private def claimAndWrite(p: Path, content: String): Boolean =
    ManifestIo.claimAndWrite(fs, p, content)

  /** Load-modify-commit loop; `mutate` must be a pure function of the
    * state so a lost race can replay it against the fresher version.
    * Returns the state the committed manifest was rendered from.
    *
    * Two separate budgets: lost CLAIM races are genuine contention and
    * bounded at 1000 attempts; waiting out a peer's mid-write claim is
    * NOT contention and is bounded by its own deadline just past
    * `staleClaimMs` — counting 20 ms sleeps against the race budget would
    * exhaust it (~20 s) before the 60 s expiry ever fired, turning one
    * crashed non-local committer into hard commit failures for all peers.
    */
  def commit(mutate: S => S): S = {
    fs.mkdirs(dir)
    var attempts = 0
    val waitDeadline = System.currentTimeMillis() + staleClaimMs + 10000
    var committed = -1L
    var result: S = emptyState
    while (committed < 0) {
      val newest = claimedVersions().headOption.getOrElse(-1L)
      if (newest >= 0 && readValid(newest).isEmpty &&
          System.currentTimeMillis() -
            fs.getFileStatus(versionFile(newest)).getModificationTime
            < staleClaimMs) {
        // a claim without content: a committer is mid-write (wait for it —
        // committing past it would build on a stale base and drop its
        // update) or crashed (expire after staleClaimMs and claim past)
        require(System.currentTimeMillis() < waitDeadline,
          "manifest commit: mid-write claim never completed nor expired")
        Thread.sleep(20)
      } else {
        attempts += 1
        require(attempts <= 1000, "manifest commit: contention limit exceeded")
        val next = mutate(load())
        if (claimAndWrite(versionFile(newest + 1), renderFull(next))) {
          committed = newest + 1; result = next
        }
      }
    }
    // prune ancient manifests so the catalog dir stays O(gcKeepVersions)
    // regardless of mutation count (each version is the FULL state)
    claimedVersions().filter(_ < committed - gcKeepVersions)
      .foreach(v => fs.delete(versionFile(v), false))
    result
  }
}
