package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Cross-process detached-job status — the one reference behavior the
  * in-process registry can't cover: process B polling or aborting
  * process A's job by id (reference running_job.go:146-193, status and
  * abort signals in etcd). The Spark-world analogue of etcd here is a
  * shared directory (NFS / fuse-mounted object store / anything both
  * drivers see):
  *
  *   - the OWNING process writes `<jobId>.status.json` atomically
  *     (temp file + atomic rename) on every state transition;
  *   - ANY process requests an abort by creating the `<jobId>.abort`
  *     marker; the owning process polls for markers while the job
  *     runs (the file-system stand-in for an etcd watch).
  *
  * Enabled by setting the system property `graft.job.statusDir` (or
  * passing a dir explicitly); unset, job control stays purely
  * in-process and nothing is written.
  */
object JobStatusStore {

  private[operators] def configuredDir: Option[Path] =
    sys.props.get("graft.job.statusDir").map(Paths.get(_))

  private def statusPath(dir: Path, jobId: String): Path =
    dir.resolve(s"$jobId.status.json")
  private def abortPath(dir: Path, jobId: String): Path =
    dir.resolve(s"$jobId.abort")

  /** Minimal hand-rolled JSON: two fixed string fields plus a flat
    * numeric metrics object — no library dependency. */
  private def render(jobId: String, state: String, owner: String,
      metrics: Map[String, Long]): String = {
    import graft.Json.str
    val ms = metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${str(k)}: $v" }.mkString(", ")
    s"""{"jobId": ${str(jobId)}, "state": ${str(state)}, """ +
      s""""owner": ${str(owner)}, "metrics": {$ms}}"""
  }

  /** Atomic publish: write-temp + rename, so a concurrent reader never
    * sees a torn file. `owner` identifies the publishing process run —
    * cleanup is owner-conditional so one process's retention timer can
    * never delete the files of ANOTHER process that reused the job id. */
  private[operators] def publish(dir: Path, jobId: String, state: String,
      owner: String, metrics: Map[String, Long]): Unit = {
    Files.createDirectories(dir)
    val tmp = Files.createTempFile(dir, s".$jobId", ".tmp")
    Files.write(tmp,
      render(jobId, state, owner, metrics).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, statusPath(dir, jobId),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def fileOwner(dir: Path, jobId: String): Option[String] = {
    val p = statusPath(dir, jobId)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      """"owner":\s*"([^"]+)"""".r.findFirstMatchIn(s).map(_.group(1))
    }
  }

  /** Read a job's last published state from the store — works from any
    * process that sees the directory. Returns the `state` field. */
  def fetchState(dir: Path, jobId: String): Option[String] = {
    val p = statusPath(dir, jobId)
    if (!Files.exists(p)) None
    else {
      val s = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      """"state":\s*"([^"]+)"""".r.findFirstMatchIn(s).map(_.group(1))
    }
  }

  /** Request an abort from any process: drop the marker file. The
    * owning process's poller picks it up within its poll interval.
    * Returns false if the job has no published status (unknown id). */
  def requestAbort(dir: Path, jobId: String): Boolean = {
    if (!Files.exists(statusPath(dir, jobId))) false
    else {
      try Files.createFile(abortPath(dir, jobId))
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      true
    }
  }

  private[operators] def abortRequested(dir: Path, jobId: String): Boolean =
    Files.exists(abortPath(dir, jobId))

  /** Remove a stale abort marker (a new run of a reused job id must not
    * inherit the previous run's abort request). */
  private[operators] def clearAbortMarker(dir: Path, jobId: String): Unit = {
    Files.deleteIfExists(abortPath(dir, jobId))
    ()
  }

  /** Remove a job's files (pairs with registry eviction) — only when
    * the status file still belongs to `owner`: a different process may
    * have reused the job id and published its own live status, which
    * the old owner's retention timer must not destroy. (Read-then-
    * delete is best-effort, like the rest of the file store.) */
  private[operators] def clear(dir: Path, jobId: String,
      owner: String): Unit =
    if (fileOwner(dir, jobId).contains(owner)) {
      Files.deleteIfExists(statusPath(dir, jobId))
      Files.deleteIfExists(abortPath(dir, jobId))
      ()
    }
}
