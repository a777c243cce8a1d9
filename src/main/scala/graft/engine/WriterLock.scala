package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import scala.util.control.NonFatal

/** Advisory cross-process single-writer lock on a store root.
  *
  * The reference is a single-owner engine by construction — one server
  * process owns the data dir and every client goes through it
  * (storage/engine.rs). graft documents the same contract
  * ([[BucketStore]] scaladoc) but a second JVM opening the same root
  * could interleave swap windows and the shared `_temporary/0` committer
  * dir. This closes that operational hazard: the FIRST [[BucketStore]]
  * for a root in this process claims `root/_writer.lock`; further
  * instances in the SAME process attach (in-process multi-instance is
  * the long-standing spec/demo pattern, and in-process mutations already
  * serialize per store); a DIFFERENT live process fails fast with a
  * clear error.
  *
  * Liveness: a heartbeat (staleMs/4) keeps the held lock's mtime fresh;
  * a lock whose mtime is older than [[staleMs]] is a dead holder and is
  * TAKEN OVER (atomic rename-retire + create-no-overwrite re-claim +
  * read-back — at most one of any set of racing claimants can win the
  * rename, so staleness observers serialize). A crashed process
  * therefore blocks a successor for at most ~staleMs — the standard
  * trade for lease locks over plain filesystems, where O(1) OS-level
  * lock release (flock) isn't available on remote stores. A shutdown
  * hook releases cleanly on normal JVM exit so sequential processes
  * never wait.
  *
  * Advisory means: create-no-overwrite + read-back-verify closes the
  * common races, but a filesystem without atomic create (raw local FS
  * has a TOCTOU window) can in principle admit two claimants — the lock
  * is an operational guard, not a correctness primitive the data path
  * relies on. */
object WriterLock {

  /** One id per PROCESS (not per store): instances in one JVM share
    * ownership, matching the single-OWNER-PROCESS contract. */
  val processOwnerId: String = java.util.UUID.randomUUID().toString

  val LockFile = "_writer.lock"

  /** Holder considered dead when its lock mtime is older than this.
    * Test seam; new acquires/heartbeats pick the current value up.
    * The reference's `RS_LOCK_FILE_TTL` (cfg/lock_file.rs:10, default
    * 30 s there; graft's library default stays 60 s — [[configure]]
    * applies the env). */
  @volatile var staleMs: Long = 60000L

  /** `RS_LOCK_FILE_*` acquisition knobs (cfg/lock_file.rs:38-65 +
    * lock_file.rs:120-161): `enabled=false` disables locking entirely;
    * a nonzero `acquireTimeoutMs` makes [[acquire]] WAIT for a live
    * holder to release (polling every `pollingMs`) instead of failing
    * fast, and on timeout either aborts (default) or — failure action
    * `proceed` — forcibly takes the lock over, exactly the reference's
    * break-out-and-claim. Library defaults preserve the historical
    * fail-fast contract; [[configure]] applies a server's env. */
  @volatile var enabled: Boolean = true
  @volatile var acquireTimeoutMs: Long = 0L
  @volatile var pollingMs: Long = 10000L
  @volatile var proceedOnTimeout: Boolean = false

  /** Apply the `RS_LOCK_FILE_*` env surface (ServerMain boot). */
  def configure(env: Map[String, String]): Unit = {
    env.get("RS_LOCK_FILE_ENABLED").foreach(v =>
      enabled = v.equalsIgnoreCase("true") || v == "1")
    env.get("RS_LOCK_FILE_TTL").flatMap(_.trim.toLongOption)
      .filter(_ > 0).foreach(ttl => staleMs = ttl * 1000L)
    env.get("RS_LOCK_FILE_TIMEOUT").flatMap(_.trim.toLongOption)
      .filter(_ >= 0).foreach(t => acquireTimeoutMs = t * 1000L)
    env.get("RS_LOCK_FILE_POLLING_INTERVAL").flatMap(_.trim.toLongOption)
      .filter(_ > 0).foreach(pi => pollingMs = pi * 1000L)
    env.get("RS_LOCK_FILE_FAILURE_ACTION").map(_.trim.toLowerCase).foreach {
      case "proceed" => proceedOnTimeout = true
      case "abort"   => proceedOnTimeout = false
      case _ => throw new IllegalArgumentException(
        "Invalid value for RS_LOCK_FILE_FAILURE_ACTION: must be 'proceed' or 'abort'")
    }
  }

  private final class Holder(val path: Path, val fs: FileSystem) {
    var refs: Int = 1
    @volatile var beat: java.util.concurrent.ScheduledFuture[_] = null
  }

  private val held = scala.collection.mutable.Map[String, Holder]()

  private lazy val heartbeats = {
    val ex = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => { val t = new Thread(r, "graft-writer-lock"); t.setDaemon(true); t })
    Runtime.getRuntime.addShutdownHook(new Thread(() => releaseAllOnExit(), "graft-lock-release"))
    ex
  }

  private def payload(): String =
    s"""{"owner":"$processOwnerId","pid":${ProcessHandle.current().pid()},""" +
      s""""host":"${java.net.InetAddress.getLocalHost.getHostName}",""" +
      s""""acquired_ms":${System.currentTimeMillis()}}"""

  private def readOwner(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val m = """"owner"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(s)
      m.map(_.group(1))
    } catch { case NonFatal(_) => None }

  /** Claim (or attach to) the writer lock for `root`. Throws
    * IllegalStateException when another LIVE process holds it. The
    * whole claim runs under the registry monitor: two same-root
    * instances racing their FIRST acquire must not both miss the
    * registry, both claim, and then overwrite each other's Holder
    * (the lost refcount would let one close() release a lock another
    * live instance relies on). Acquire is once per root per process,
    * so serializing the fs work here costs nothing that matters. */
  def acquire(root: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    if (!enabled) return
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    while (true) {
      try { tryAcquireOnce(root, conf, force = false); return }
      catch { case e: IllegalStateException =>
        val remaining = deadline - System.currentTimeMillis()
        if (acquireTimeoutMs <= 0L || remaining <= 0L) {
          if (proceedOnTimeout && acquireTimeoutMs > 0L) {
            // FailureAction::Proceed (lock_file.rs:143-149): claim anyway
            System.err.println(s"[writer-lock] timeout waiting for '$root', " +
              "proceeding per RS_LOCK_FILE_FAILURE_ACTION=proceed")
            tryAcquireOnce(root, conf, force = true)
            return
          }
          throw e
        }
        Thread.sleep(math.min(pollingMs, remaining))
      }
    }
  }

  private def tryAcquireOnce(root: String,
      conf: org.apache.hadoop.conf.Configuration,
      force: Boolean): Unit = held.synchronized {
    val p0 = new Path(root, LockFile)
    val fs = p0.getFileSystem(conf)
    val p = fs.makeQualified(p0)
    val key = p.toUri.toString
    held.get(key) match {
      case Some(h) => h.refs += 1; return
      case None =>
    }
    fs.mkdirs(p.getParent)
    val st = try Some(fs.getFileStatus(p)) catch { case _: java.io.FileNotFoundException => None }
    st match {
      case Some(s) if readOwner(fs, p).contains(processOwnerId) =>
        // ours from a prior un-released instance in this process: reattach
        ()
      case Some(s) if !force &&
          System.currentTimeMillis() - s.getModificationTime <= staleMs =>
        throw new IllegalStateException(
          s"store root '$root' is owned by another live writer process " +
            s"(${readOwner(fs, p).getOrElse("unknown")}, lock ${p.toUri.getPath}, " +
            s"heartbeat ${System.currentTimeMillis() - s.getModificationTime} ms ago); " +
            "one process owns a store root at a time — route writes through it, " +
            s"or remove the lock file if the holder is truly gone")
      case Some(_) => // stale: dead holder — take over
        // RETIRE the stale file by rename first: rename-to-unique is the
        // one mutation exactly ONE claimant can win, so two processes
        // that both observed staleness serialize here instead of both
        // passing an overwrite+verify (two racing overwrites could each
        // verify before the other's write landed — two live writers,
        // the exact hazard this lock exists to prevent). The loser's
        // rename fails → lost race. The winner then claims with
        // create-no-overwrite, mirroring the fresh-claim branch, so a
        // third claimant that slipped in after the delete also loses.
        val retired = new Path(p.getParent, s"$LockFile.stale.$processOwnerId")
        val won = try fs.rename(p, retired) catch { case NonFatal(_) => false }
        if (!won)
          throw new IllegalStateException(
            s"store root '$root': lost the lock-takeover race " +
              s"(another claimant retired the stale lock first)")
        try fs.delete(retired, false) catch { case NonFatal(_) => () }
        try {
          val os = fs.create(p, false)
          try os.write(payload().getBytes("UTF-8")) finally os.close()
        } catch {
          case _: java.io.IOException =>
            throw new IllegalStateException(
              s"store root '$root': lost the lock-takeover race to " +
                s"${readOwner(fs, p).getOrElse("unknown")}")
        }
        Thread.sleep(20) // let a racing claimant's write land before verify
        if (!readOwner(fs, p).contains(processOwnerId))
          throw new IllegalStateException(
            s"store root '$root': lost the lock-takeover race to " +
              s"${readOwner(fs, p).getOrElse("unknown")}")
      case None =>
        // atomic claim where the fs supports it; racing claimants verify
        try {
          val os = fs.create(p, false)
          try os.write(payload().getBytes("UTF-8")) finally os.close()
        } catch {
          case _: java.io.IOException =>
            // creation raced or fs refused — re-check against live holder
            val owner = readOwner(fs, p)
            if (!owner.contains(processOwnerId))
              throw new IllegalStateException(
                s"store root '$root' was just claimed by another writer " +
                  s"process (${owner.getOrElse("unknown")})")
        }
        Thread.sleep(20)
        if (!readOwner(fs, p).contains(processOwnerId))
          throw new IllegalStateException(
            s"store root '$root': lost the lock-claim race to " +
              s"${readOwner(fs, p).getOrElse("unknown")}")
    }
    val h = new Holder(p, fs)
    val period = math.max(staleMs / 4, 250L)
    h.beat = heartbeats.scheduleAtFixedRate(() => {
      try {
        // verify ownership BEFORE refreshing: if we missed beats past
        // staleMs (GC pause, fs outage) a successor may have legally
        // taken over — refreshing ITS file, or blind-recreating over
        // its claim window, would manufacture two live writers, the
        // exact hazard the lock exists for. Lost lease → stop beating
        // and scream; the next mutation's failure modes are the
        // operator's signal (the takeover already decided ownership).
        readOwner(fs, p) match {
          case Some(o) if o == processOwnerId =>
            fs.setTimes(p, System.currentTimeMillis(), -1): Unit
          case Some(_) =>
            System.err.println(s"[writer-lock] LEASE LOST for ${p.toUri.getPath}: " +
              "another process took over after missed heartbeats; stopping beat")
            h.beat.cancel(false): Unit
          case None => // vanished: manual delete OR a takeover's
            // delete/create window — re-assert only via atomic
            // create-no-overwrite so a racing claimant always wins
            try {
              val os = fs.create(p, false)
              try os.write(payload().getBytes("UTF-8")) finally os.close()
            } catch { case _: java.io.IOException =>
              System.err.println(s"[writer-lock] LEASE LOST for ${p.toUri.getPath}: " +
                "lock vanished and was re-claimed by another process; stopping beat")
              h.beat.cancel(false): Unit
            }
        }
      } catch { case NonFatal(_) => () } // missed beat ≠ lost lock; next fires
    }, period, period, java.util.concurrent.TimeUnit.MILLISECONDS)
    held.put(key, h): Unit
  }

  /** Drop one reference; the LAST release stops the heartbeat and
    * deletes the lock file (only if still ours). */
  def release(root: String, conf: org.apache.hadoop.conf.Configuration): Unit = {
    val p0 = new Path(root, LockFile)
    val fs = p0.getFileSystem(conf)
    val key = fs.makeQualified(p0).toUri.toString
    val last = held.synchronized {
      held.get(key) match {
        case None => None
        case Some(h) =>
          h.refs -= 1
          if (h.refs > 0) None else { held.remove(key); Some(h) }
      }
    }
    last.foreach { h =>
      if (h.beat != null) h.beat.cancel(false)
      try if (readOwner(h.fs, h.path).contains(processOwnerId))
        h.fs.delete(h.path, false): Unit
      catch { case NonFatal(_) => () }
    }
  }

  private def releaseAllOnExit(): Unit = {
    val all = held.synchronized { val v = held.values.toSeq; held.clear(); v }
    all.foreach { h =>
      if (h.beat != null) h.beat.cancel(false)
      try if (readOwner(h.fs, h.path).contains(processOwnerId))
        h.fs.delete(h.path, false): Unit
      catch { case NonFatal(_) => () }
    }
  }

  /** Spec hook: whether this process currently holds `root`'s lock. */
  private[graft] def heldFor(root: String,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    val p0 = new Path(root, LockFile)
    val key = p0.getFileSystem(conf).makeQualified(p0).toUri.toString
    held.synchronized(held.contains(key))
  }
}
