package graft.workflow

import graft.sources.FileCatalog

/** File-arrival monitoring — the DFU monitor jobs behind
  * `Std.File.MonitorLogicalFileName` / `MonitorFile`
  * (`ecllibrary/std/File.ecl:843,871`; engine `dali/dfu/dfurun.cpp:814`
  * `performMonitor`, driven by `monitorCycle`'s timer at :742): watch for
  * logical files in the catalog (or physical files on a landing-zone
  * directory) and fire a named [[Events]] event per arrival, with the
  * triggering filename as the event text — the landing-zone-triggered
  * pipeline pattern (`job : WHEN(EVENT('fileLanded', '*'))`).
  *
  * Reference semantics preserved:
  *   - poll-cycle model: each [[poll]] is one `monitorCycle`; a file
  *     already present at the FIRST cycle triggers (the reference's
  *     triggered-list starts empty, so exists → fire);
  *   - the triggered list is reset to the *currently matching* set each
  *     cycle, so a file that disappears and reappears fires again;
  *   - physical-file identity is `name;modtime` (dfurun.cpp builds
  *     `fnamedate`), so an overwritten landing-zone file re-fires —
  *     logical identity is the name alone (metadata commit is the event);
  *   - `shotCount` counts FIRED EVENTS, not cycles; reaching it completes
  *     the monitor mid-cycle (remaining matches do not fire); -1 runs
  *     until [[abort]];
  *   - a default event name mirrors `DfuLogicalFileMonitor`.
  *
  * Driver-side by design, like [[Events]]: monitors coordinate *jobs*;
  * only name→path metadata is examined, never row data. At 100 TB the
  * poll cost is one manifest read (logical) or one directory listing
  * (physical) per cycle, independent of data volume.
  */
final class FileMonitor(scheduler: Events.Scheduler) {

  /** `matches()` yields (identity, eventText) pairs: identity keys the
    * triggered list (includes modtime for physical files), eventText is
    * what the fired event carries (always the plain name/path).
    */
  private final case class Mon(id: String, event: String,
      matches: () => Seq[(String, String)], shotLimit: Int) {
    var triggered: Set[String] = Set.empty // reference's TriggeredList
    var shots: Int = 0
    var active: Boolean = true
  }

  private val monitors = scala.collection.mutable.ArrayBuffer.empty[Mon]
  private val lock = new Object
  private var nextId = 0
  @volatile private var ticker: Option[Thread] = None

  private def add(event: String, matches: () => Seq[(String, String)],
      shotCount: Int): String = lock.synchronized {
    nextId += 1
    val id = f"M$nextId%08d" // the DFU-workunit-id analog
    monitors += Mon(id,
      if (event.nonEmpty) event else "DfuLogicalFileMonitor",
      matches, shotCount)
    id
  }

  /** `Std.File.MonitorLogicalFileName(event, name, shotCount)`: watch the
    * catalog for logical names matching `namePattern` (`*`/`?` wildcards,
    * the event-filter dialect). Returns the monitor id (the DFU wuid
    * analog of `fMonitorLogicalFileName`).
    */
  def monitorLogicalFileName(eventToFire: String, namePattern: String,
      shotCount: Int = 1)(implicit catalog: FileCatalog): String =
    add(eventToFire, () => catalog.list(namePattern).map(n => (n, n)),
      shotCount)

  /** `Std.File.MonitorFile(event, ip, filename, subDirs, shotCount)`:
    * watch a directory for physical files whose basename matches
    * `filemask`. Identity is `name;modtime` — a rewritten file fires
    * again, exactly as the reference's `fnamedate` key.
    */
  def monitorFile(eventToFire: String, dir: String, filemask: String,
      subDirs: Boolean = false, shotCount: Int = 1): String = {
    def walk(d: java.io.File): Seq[java.io.File] = {
      val kids = Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      kids.filter(_.isFile) ++
        (if (subDirs) kids.filter(_.isDirectory).flatMap(walk) else Seq.empty)
    }
    add(eventToFire, () =>
      walk(new java.io.File(dir))
        .filter(f => Events.wildcardMatch(filemask, f.getName))
        .map(f => (s"${f.getPath};${f.lastModified()}", f.getPath)),
      shotCount)
  }

  /** Custom match source (test seam + extension point): same lifecycle as
    * the File.ecl monitors, arbitrary (identity, eventText) producer.
    */
  private[graft] def monitorCustom(eventToFire: String,
      matches: () => Seq[(String, String)], shotCount: Int = 1): String =
    add(eventToFire, matches, shotCount)

  /** `Std.File.AbortDfuWorkunit` on a monitor id: deactivate. */
  def abort(id: String): Unit = lock.synchronized {
    monitors.filter(_.id == id).foreach(_.active = false)
  }

  /** Is the monitor still watching (shot limit not reached, not aborted)? */
  def isActive(id: String): Boolean = lock.synchronized {
    monitors.exists(m => m.id == id && m.active)
  }

  /** One `monitorCycle` over all active monitors. Fires events for every
    * match not already on the monitor's triggered list, then resets the
    * list to the currently-matching set. Returns the number of events
    * fired. Deterministic (sorted match order) so specs can drive cycles
    * directly; production use runs it from [[start]]'s timer.
    */
  def poll(): Int = {
    // fire outside the lock: WHEN jobs may themselves register monitors
    val toFire = lock.synchronized {
      monitors.filter(_.active).flatMap { m =>
        // a transient catalog/IO error in one monitor must not abort the
        // cycle (dfurun keeps the monitor wu alive and retries next cycle):
        // skip this monitor this cycle, leave its triggered list untouched
        val done = try m.matches().sortBy(_._1) catch {
          case scala.util.control.NonFatal(_) => m.triggered.toSeq.sorted.map(t => (t, t))
        }
        val fresh = done.filterNot(d => m.triggered.contains(d._1))
          .takeWhile { _ =>
            val go = m.shotLimit < 0 || m.shots < m.shotLimit
            if (go) m.shots += 1
            go
          }
        if (m.shotLimit >= 0 && m.shots >= m.shotLimit) m.active = false
        m.triggered = done.map(_._1).toSet
        fresh.map { case (_, text) => (m.event, text) }
      }.toSeq
    }
    toFire.foreach { case (ev, text) => scheduler.notify(ev, text) }
    toFire.size
  }

  /** The DFU server's monitor timer (`monitorCycle` every `DFUmonitorInterval`):
    * poll on a daemon thread until [[stop]].
    */
  def start(intervalMs: Long = 1000L): Unit = lock.synchronized {
    if (ticker.isEmpty) {
      val t = new Thread(() => {
        try {
          while (ticker.contains(Thread.currentThread())) {
            // an escaped error (from the scheduler's notify, say) must not
            // leave a dead thread behind a non-empty `ticker` — that would
            // make a later start() a silent no-op
            try poll() catch { case scala.util.control.NonFatal(_) => () }
            Thread.sleep(intervalMs)
          }
        } finally lock.synchronized {
          if (ticker.contains(Thread.currentThread())) ticker = None
        }
      }, "graft-file-monitor")
      t.setDaemon(true)
      ticker = Some(t)
      t.start()
    }
  }

  def stop(): Unit = { ticker = None }
}
