package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.charset.StandardCharsets.UTF_8

/** Std.File / fileservices surface (ref `plugins/fileservices`,
  * `ecllibrary/std/File.ecl:126-1065`): a logical-file catalog — the Dali
  * DFS analog — mapping logical names to physical parquet locations, plus
  * superfiles (named unions read as one dataset,
  * `dali/base/dadfs.hpp:493` `IDistributedSuperFile`) with ATOMIC
  * add/remove/swap transactions (`File.ecl:982`
  * StartSuperFileTransaction / `:1065` FinishSuperFileTransaction).
  *
  * Catalog state is a single versioned manifest under
  * `<root>/_catalog/v%016d.txt`. Every mutation (or transaction of
  * mutations) loads the newest VALID version, applies in memory, and
  * commits by atomically CLAIMING the next version number with a
  * create-exclusive (O_EXCL — `File.createNewFile` on local filesystems,
  * `FileSystem.create(overwrite=false)` on HDFS-likes, both atomic winner
  * election) and then writing the manifest terminated by an `#END` line.
  * Two racing committers cannot both claim a version (optimistic
  * concurrency, the Dali lock analog); readers accept only
  * `#END`-terminated files, so a crash mid-write leaves a junk claim that
  * readers skip and committers expire. This is a lakehouse-style log
  * protocol reduced to the catalog's needs — POSIX rename is NOT used for
  * commits because it silently overwrites, which would drop a racing
  * committer's update.
  *
  * Data-plane reads stay fully distributed: [[readSuper]] is the
  * path-union parquet scan ([[Sources.superfile]]); only name→path
  * metadata round-trips through the driver, exactly as Dali serves
  * metadata while Thor moves the rows.
  */
final class FileCatalog(spark: SparkSession, root: String) {

  private val catalogDir = new Path(root, "_catalog")
  private def fs: FileSystem =
    catalogDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Catalog state: logical files (name → physical path) and superfiles
    * (name → ordered sub-file logical names).
    */
  private final case class State(files: Map[String, String],
      supers: Map[String, Vector[String]])

  private val EndMarker = "#END"
  /** A claimed-but-unterminated manifest older than this is a crashed
    * committer's junk: readers already skip it; committers claim past it.
    */
  private val staleClaimMs = 60000L

  private def versionOf(p: Path): Long = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".txt"))
      try n.substring(1, n.length - 4).toLong catch { case _: Exception => -1L }
    else -1L
  }

  private def versionFile(v: Long) = new Path(catalogDir, f"v$v%016d.txt")

  /** All claimed version numbers, descending (valid or not). */
  private def claimedVersions(): Seq[Long] =
    if (!fs.exists(catalogDir)) Nil
    else fs.listStatus(catalogDir).map(s => versionOf(s.getPath))
      .filter(_ >= 0).sorted.reverse.toSeq

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

  // line format: F\tname\tpath | S\tname\tsub1\tsub2… (names may not
  // contain tab/newline — enforced at registration)
  private def parse(text: String): State = {
    val lines = text.split("\n").filter(_.nonEmpty)
    State(
      lines.filter(_.startsWith("F\t")).map { l =>
        val p = l.split("\t", -1); p(1) -> p(2)
      }.toMap,
      lines.filter(_.startsWith("S\t")).map { l =>
        val p = l.split("\t", -1); p(1) -> p.drop(2).filter(_.nonEmpty).toVector
      }.toMap)
  }

  /** Newest complete state (crashed half-written claims are skipped). */
  private def load(): State =
    claimedVersions().iterator.flatMap(readValid).map(parse).nextOption()
      .getOrElse(State(Map.empty, Map.empty))

  private def render(s: State): String = {
    val fLines = s.files.toSeq.sorted.map { case (n, p) => s"F\t$n\t$p" }
    val sLines = s.supers.toSeq.sortBy(_._1).map { case (n, subs) =>
      (Seq("S", n) ++ subs).mkString("\t")
    }
    (fLines ++ sLines :+ EndMarker).mkString("\n")
  }

  /** Atomic create-exclusive claim + content write. Local filesystems go
    * through `File.createNewFile` (O_CREAT|O_EXCL — RawLocalFileSystem's
    * `create(overwrite=false)` is check-then-create, not atomic); other
    * schemes use the filesystem's exclusive create.
    */
  private def claimAndWrite(p: Path, content: String): Boolean = {
    val scheme = Option(p.toUri.getScheme)
      .orElse(Option(fs.getUri.getScheme)).getOrElse("file")
    if (scheme == "file") {
      val f = new java.io.File(
        Option(p.toUri.getPath).getOrElse(p.toString))
      if (!f.createNewFile()) return false
      val out = new java.io.FileOutputStream(f)
      try out.write(content.getBytes(UTF_8)) finally out.close()
      true
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(content.getBytes(UTF_8)) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  /** Old manifests kept after a commit. The margin covers readers that
    * listed versions just before a burst of commits; beyond it, history is
    * garbage (the newest valid manifest is the whole state).
    */
  private val gcKeepVersions = 32L

  /** Load-modify-commit loop; `mutate` must be a pure function of the
    * state so a lost race can replay it against the fresher version.
    */
  private def commit(mutate: State => State): Unit = {
    fs.mkdirs(catalogDir)
    var attempts = 0
    var committed = -1L
    while (committed < 0) {
      attempts += 1
      require(attempts <= 1000, "catalog commit: contention limit exceeded")
      val newest = claimedVersions().headOption.getOrElse(-1L)
      if (newest >= 0 && readValid(newest).isEmpty) {
        // a claim without content: a committer is mid-write (wait for it —
        // committing past it would build on a stale base and drop its
        // update) or crashed (expire after staleClaimMs and claim past)
        val age = System.currentTimeMillis() -
          fs.getFileStatus(versionFile(newest)).getModificationTime
        if (age < staleClaimMs) { Thread.sleep(20) }
        else if (claimAndWrite(versionFile(newest + 1),
          render(mutate(load())))) committed = newest + 1
      } else if (claimAndWrite(versionFile(newest + 1),
        render(mutate(load())))) committed = newest + 1
    }
    // prune ancient manifests so the catalog dir stays O(gcKeepVersions)
    // regardless of mutation count (each version is the FULL state)
    claimedVersions().filter(_ < committed - gcKeepVersions)
      .foreach(v => fs.delete(versionFile(v), false))
  }

  private def checkName(n: String): String = {
    require(n.nonEmpty && !n.exists(c => c == '\t' || c == '\n'),
      s"illegal logical name: '$n'")
    n
  }

  // ---- logical files (File.ecl:126-214) -----------------------------------

  /** FileExists. */
  def exists(name: String): Boolean = load().files.contains(name)

  /** Catalog an existing physical location under a logical name. */
  def register(name: String, path: String): Unit = {
    checkName(name)
    commit(s => s.copy(files = s.files + (name -> path)))
  }

  /** Physical directory for a catalog-managed logical file: ECL scope
    * separators (`::`) and other URI-hostile characters sanitize away; an
    * 8-hex content hash of the full name keeps sanitized collisions apart.
    */
  private def physicalDir(name: String): String = {
    val safe = name.replaceAll("[^A-Za-z0-9._-]", "_")
    val h = java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(name))
    new Path(new Path(root, "data"), s"$safe-$h").toString
  }

  /** OUTPUT to a logical file: write parquet under the catalog root, then
    * register. The write happens BEFORE the metadata commit, so a crash
    * mid-write never publishes a half-written file.
    */
  def write(name: String, df: DataFrame): Unit = {
    checkName(name)
    val path = physicalDir(name)
    df.write.mode("overwrite").parquet(path)
    register(name, path)
  }

  /** Read a logical file. */
  def read(name: String): DataFrame = {
    val st = load()
    require(st.files.contains(name), s"no such logical file: $name")
    spark.read.parquet(st.files(name))
  }

  /** DeleteLogicalFile: drops the catalog entry (and any superfile
    * memberships); physical data is removed only when it lives under the
    * catalog's own data dir.
    */
  def delete(name: String, allowMissing: Boolean = false): Unit = {
    val known = load().files.get(name)
    require(known.nonEmpty || allowMissing, s"no such logical file: $name")
    commit(s => State(s.files - name,
      s.supers.map { case (k, subs) => k -> subs.filterNot(_ == name) }))
    known.filter(_.startsWith(new Path(root, "data").toString))
      .foreach(p => fs.delete(new Path(p), true))
  }

  /** RenameLogicalFile: metadata-only (the physical path is unchanged),
    * so renames are O(1) regardless of file size — as in the reference,
    * where rename edits the DFS tree, not the parts.
    */
  def rename(oldName: String, newName: String,
      allowOverwrite: Boolean = false): Unit = {
    checkName(newName)
    commit { s =>
      require(s.files.contains(oldName), s"no such logical file: $oldName")
      require(allowOverwrite || !s.files.contains(newName),
        s"target exists: $newName")
      State(s.files - oldName + (newName -> s.files(oldName)),
        s.supers.map { case (k, subs) =>
          k -> subs.map(x => if (x == oldName) newName else x)
        })
    }
  }

  /** GetLogicalFileAttribute-style info: physical path, total bytes,
    * newest modification time, part count.
    */
  def info(name: String): Option[(String, Long, Long, Int)] =
    load().files.get(name).map { p =>
      val path = new Path(p)
      if (!fs.exists(path)) (p, 0L, 0L, 0)
      else {
        val sum = fs.getContentSummary(path)
        val parts = fs.listStatus(path)
          .count(st => st.getPath.getName.startsWith("part-"))
        val modified = fs.listStatus(path).map(_.getModificationTime)
          .foldLeft(0L)(_ max _)
        (p, sum.getLength, modified, parts)
      }
    }

  /** LogicalFileList with `*`/`?` wildcards. */
  def list(pattern: String = "*"): Seq[String] =
    load().files.keys.toSeq.sorted
      .filter(graft.workflow.Events.wildcardMatch(pattern, _))

  // ---- superfiles (File.ecl:917-1065) -------------------------------------

  def createSuperFile(name: String, allowExist: Boolean = false): Unit = {
    checkName(name)
    commit { s =>
      require(allowExist || !s.supers.contains(name),
        s"superfile exists: $name")
      if (s.supers.contains(name)) s
      else s.copy(supers = s.supers + (name -> Vector.empty))
    }
  }

  def superFileExists(name: String): Boolean = load().supers.contains(name)

  def deleteSuperFile(name: String): Unit =
    commit(s => s.copy(supers = s.supers - name))

  /** GetSuperFileSubName list, in position order. */
  def superFileContents(name: String): Seq[String] = {
    val st = load()
    require(st.supers.contains(name), s"no such superfile: $name")
    st.supers(name)
  }

  /** A batch of superfile mutations committed as ONE catalog version —
    * StartSuperFileTransaction/FinishSuperFileTransaction. The ops build a
    * new membership state in memory; readers see either none or all of
    * them, and an exception inside `body` publishes nothing.
    */
  final class Txn private[FileCatalog] {
    private[FileCatalog] var ops =
      Vector.empty[State => State]
    private def push(f: State => State): Unit = ops = ops :+ f

    def addSuperFile(superName: String, subName: String): Unit =
      push { s =>
        require(s.supers.contains(superName), s"no such superfile: $superName")
        require(s.files.contains(subName), s"no such logical file: $subName")
        val subs = s.supers(superName)
        require(!subs.contains(subName), s"$subName already in $superName")
        s.copy(supers = s.supers + (superName -> (subs :+ subName)))
      }

    def removeSuperFile(superName: String, subName: String): Unit =
      push { s =>
        require(s.supers.contains(superName), s"no such superfile: $superName")
        s.copy(supers = s.supers +
          (superName -> s.supers(superName).filterNot(_ == subName)))
      }

    def clearSuperFile(superName: String): Unit =
      push { s =>
        require(s.supers.contains(superName), s"no such superfile: $superName")
        s.copy(supers = s.supers + (superName -> Vector.empty))
      }

    /** ReplaceSuperFile: atomic old→new swap (`File.ecl:1057`). */
    def replaceSuperFile(superName: String, oldSub: String,
        newSub: String): Unit = {
      removeSuperFile(superName, oldSub)
      addSuperFile(superName, newSub)
    }

    /** SwapSuperFile: exchange the contents of two superfiles
      * (`File.ecl:1046`).
      */
    def swapSuperFile(a: String, b: String): Unit =
      push { s =>
        require(s.supers.contains(a) && s.supers.contains(b),
          s"no such superfile: $a / $b")
        s.copy(supers = s.supers + (a -> s.supers(b)) + (b -> s.supers(a)))
      }
  }

  /** Run superfile mutations transactionally (one version commit). */
  def transaction(body: Txn => Unit): Unit = {
    val t = new Txn
    body(t) // throws → nothing committed
    commit(s => t.ops.foldLeft(s)((acc, op) => op(acc)))
  }

  /** Single-op conveniences (each its own transaction). */
  def addSuperFile(superName: String, subName: String): Unit =
    transaction(_.addSuperFile(superName, subName))
  def removeSuperFile(superName: String, subName: String): Unit =
    transaction(_.removeSuperFile(superName, subName))
  def replaceSuperFile(superName: String, oldSub: String, newSub: String): Unit =
    transaction(_.replaceSuperFile(superName, oldSub, newSub))

  // ---- DFU spray/despray (dali/ft/daft.cpp; File.ecl:551 SprayDelimited,
  // :720 Despray): partitioned import/export between external delimited
  // files and catalog-managed parquet -------------------------------------

  /** SprayDelimited: import an external delimited file as an N-part
    * managed logical file. The layout is DECLARED (ICsvParameters
    * contract — no inference); `parts` maps to the parallelism the DFU
    * would spread across slaves (a repartition, so the write is
    * distributed regardless of how few blocks the source has).
    */
  def sprayDelimited(name: String, sourcePath: String,
      schema: org.apache.spark.sql.types.StructType, parts: Int,
      sep: String = ",", header: Boolean = false): Unit = {
    require(parts >= 1, "parts must be >= 1")
    write(name, Sources.csvRead(spark, sourcePath, schema, sep, header)
      .repartition(parts))
  }

  /** Despray: export a logical file to ONE external delimited file (the
    * DFU's N-parts→single-file direction). The single-part write is the
    * point of despray — use OUTPUT/superfiles for big exports.
    */
  def despray(name: String, destPath: String, sep: String = ",",
      header: Boolean = false): Unit = {
    val tmp = new Path(new Path(root, "_despray"),
      java.util.UUID.randomUUID().toString)
    read(name).coalesce(1).write
      .option("sep", sep).option("header", header).csv(tmp.toString)
    val part = fs.listStatus(tmp)
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(throw new IllegalStateException("despray: no part file"))
    val dest = new Path(destPath)
    fs.delete(dest, false)
    fs.mkdirs(dest.getParent)
    require(fs.rename(part, dest), s"despray: rename to $destPath failed")
    fs.delete(tmp, true)
  }

  /** Superfile read: the path-union parquet scan over current members. */
  def readSuper(name: String): DataFrame = {
    val st = load()
    require(st.supers.contains(name), s"no such superfile: $name")
    val subs = st.supers(name)
    require(subs.nonEmpty, s"superfile $name is empty (schema unknown)")
    Sources.superfile(spark, subs.map(st.files(_)))
  }
}
