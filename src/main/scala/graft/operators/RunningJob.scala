package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Dataset, SparkSession}

/** R2/R3 — detached job control (reference running_job.go): the action
  * runs on a background thread under a Spark job group; `abort()` maps
  * to `cancelJobGroup`, and any code in this process can look the job
  * up by id via `RunningJob.fetch` (the reference needs etcd for this;
  * in-process registry here — SURVEY §3.2 documents the divergence).
  */
final class RunningJob private (
    val jobId: String,
    spark: SparkSession,
    acc: MetricsAccumulator,
    abortFlag: java.util.concurrent.atomic.AtomicBoolean,
    future: Future[Seq[KV]]) {

  private def aborted: Boolean = abortFlag.get

  def isDone: Boolean = future.isCompleted

  def status: String =
    if (!future.isCompleted) "running"
    else future.value.get match {
      case Success(_) => "succeeded"
      case Failure(_) if aborted => "aborted"
      case Failure(_) => "failed"
    }

  /** Block until completion; throws the job's failure (first task
    * failure fails the job — reference semantics, though Spark retried
    * first). */
  def waitForResult(timeout: Duration = Duration.Inf): Seq[KV] =
    Await.result(future, timeout)

  def waitForCompletion(timeout: Duration = Duration.Inf): Try[Seq[KV]] = {
    Try(Await.ready(future, timeout))
    future.value.getOrElse(Failure(new java.util.concurrent.TimeoutException))
  }

  /** Abort: cancels every Spark job tagged with this job group
    * (reference running_job.go:120-143). `cancelJobGroup` only reaches
    * jobs that are ACTIVE at the moment of the call, so the flag makes
    * an abort that races ahead of the background thread's first job
    * stick (the thread re-checks it before collecting), and the
    * re-cancels catch a job submitted inside that window. */
  def abort(): Unit = {
    abortFlag.set(true)
    spark.sparkContext.cancelJobGroup(jobId)
    RunningJob.recancelLater(spark, jobId, this)
  }

  def metrics: Map[String, Long] = acc.value
}

object RunningJob {
  private val registry = new ConcurrentHashMap[String, RunningJob]()

  private implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-background-job")
      t.setDaemon(true)
      t
    }))

  private val evictor =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-job-evictor")
      t.setDaemon(true)
      t
    })

  /** Completed jobs stay fetchable for this long, then evict — the
    * registry is otherwise a process-lifetime leak (one entry plus its
    * captured result per background job, forever). The reference's
    * detached statuses live in etcd with the cluster's own retention;
    * in-process, a bounded grace window is the equivalent contract:
    * status is fetchable for a while after completion, then gone. */
  private def retentionMs: Long =
    sys.props.get("graft.job.retentionMs").map(_.toLong)
      .getOrElse(5L * 60 * 1000)

  /** Identifies THIS process run in the cross-process status store, so
    * retention cleanup never touches files published by another
    * process that reused a job id. */
  private val ownerId = java.util.UUID.randomUUID().toString

  /** Belt-and-braces for the abort-before-first-job race: re-cancel
    * shortly after, catching a job submitted between the abort call and
    * the background thread's first submission. */
  private[operators] def recancelLater(
      spark: SparkSession, jobId: String, job: RunningJob): Unit =
    Seq(250L, 1000L).foreach { delay =>
      evictor.schedule(new Runnable {
        override def run(): Unit =
          if (!job.isDone) spark.sparkContext.cancelJobGroup(jobId)
      }, delay, java.util.concurrent.TimeUnit.MILLISECONDS)
      ()
    }

  private[operators] def start(
      jobId: String,
      spark: SparkSession,
      ds: Dataset[KV],
      acc: MetricsAccumulator): RunningJob = {
    val abortFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val future = Future {
      spark.sparkContext.setJobGroup(jobId, s"graft job $jobId",
        interruptOnCancel = true)
      // an abort() issued before this thread got here found no active
      // jobs to cancel — honor it instead of running to completion
      if (abortFlag.get)
        throw new IllegalStateException(s"job $jobId aborted before start")
      try ds.collect().toSeq
      finally spark.sparkContext.clearJobGroup()
    }
    val job = new RunningJob(jobId, spark, acc, abortFlag, future)
    registry.put(jobId, job)
    // Cross-process status store (reference: etcd; here a shared dir).
    // Publish "running" now, the terminal state on completion, and poll
    // for abort markers dropped by other processes while running.
    val store = JobStatusStore.configuredDir
    store.foreach { dir =>
      // a reused job id must not inherit a stale abort marker from a
      // previous run (e.g. an abort requested just as run 1 finished,
      // or an owner that crashed before its retention cleanup)
      JobStatusStore.clearAbortMarker(dir, jobId)
      JobStatusStore.publish(dir, jobId, "running", ownerId, Map.empty)
      lazy val poller: java.util.concurrent.ScheduledFuture[_] =
        evictor.scheduleWithFixedDelay(new Runnable {
          override def run(): Unit =
            if (JobStatusStore.abortRequested(dir, jobId) && !job.isDone)
              job.abort()
        }, 200, 200, java.util.concurrent.TimeUnit.MILLISECONDS)
      val started = poller
      future.onComplete { _ => started.cancel(false) }
    }
    future.onComplete { _ =>
      store.foreach(dir =>
        JobStatusStore.publish(dir, jobId, job.status, ownerId, job.metrics))
      evictor.schedule(new Runnable {
        override def run(): Unit = {
          // conditional remove: if a NEW job reused this id meanwhile
          // (this process OR another — the store clear is additionally
          // owner-guarded), neither evict it nor delete its files
          if (registry.remove(jobId, job))
            store.foreach(dir => JobStatusStore.clear(dir, jobId, ownerId))
        }
      }, retentionMs, java.util.concurrent.TimeUnit.MILLISECONDS)
    }
    job
  }

  /** R3 — FetchDetachedJobStatus equivalent (in-process). Completed
    * jobs remain fetchable for the retention window, then evict. */
  def fetch(jobId: String): Option[RunningJob] = Option(registry.get(jobId))

  /** R3 — AbortDetachedJob equivalent. */
  def abort(jobId: String): Boolean =
    fetch(jobId).exists { j => j.abort(); true }

  /** Drop a job from the registry immediately (explicit cleanup for
    * callers that don't want to wait out the retention window). */
  def remove(jobId: String): Boolean = registry.remove(jobId) != null

  /** Jobs currently held by the registry (running or inside their
    * post-completion retention window). */
  def registeredCount: Int = registry.size

  /** Live gauge snapshot — the programmatic parity surface for the
    * reference's Prometheus worker gauge (reference
    * metric/worker_metrics.go:15-21, `lrmr_running_tasks` labeled per
    * node). Counts come from a [[SparkListener]] registered on the
    * context (raw scheduler task-start/task-end events — exactly how
    * Prometheus exporters meter Spark), NOT from `statusTracker`: the
    * status store skips live task-counter updates when the UI is
    * disabled, so its counts read 0 mid-flight on headless sessions.
    * `activeTasksByExecutor` keys are host/executorId (the Spark
    * analogue of the reference's host+tag labels). Task gauges cover
    * EVERY job on the context — the same scope the reference gauge has
    * on a worker — while `registeredJobs`/`runningJobs` scope to graft
    * background jobs. Tasks already in flight when the first `gauges`
    * call registers the listener are not counted (ends without starts
    * floor at zero, never go negative). */
  final case class Gauges(
      registeredJobs: Int,
      runningJobs: Int,
      activeTasks: Int,
      activeTasksByExecutor: Map[String, Int])

  private final class TaskGaugeListener
      extends org.apache.spark.scheduler.SparkListener {
    private[RunningJob] val byExec =
      new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    private[RunningJob] val total =
      new java.util.concurrent.atomic.AtomicInteger(0)
    private def dec(i: java.util.concurrent.atomic.AtomicInteger): Unit = {
      i.updateAndGet(n => math.max(0, n - 1)); ()
    }
    override def onTaskStart(
        e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit = {
      total.incrementAndGet()
      byExec.computeIfAbsent(
        s"${e.taskInfo.host}/${e.taskInfo.executorId}",
        _ => new java.util.concurrent.atomic.AtomicInteger(0))
        .incrementAndGet()
      ()
    }
    override def onTaskEnd(
        e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      dec(total)
      Option(byExec.get(s"${e.taskInfo.host}/${e.taskInfo.executorId}"))
        .foreach(dec)
    }
  }

  // one listener per SparkContext (keyed by app id), installed lazily on
  // the first gauges() read. Only one SparkContext is live per JVM, so
  // retaining just the current app id evicts listeners left behind by
  // stopped contexts (their buses are gone; without the retain, one
  // listener + counter map per restarted session leaks for the JVM
  // lifetime). byExec keeps one entry per executor ever seen on the
  // LIVE context — bounded by cluster size.
  private val gaugeListeners =
    new ConcurrentHashMap[String, TaskGaugeListener]()
  private def listenerFor(spark: SparkSession): TaskGaugeListener = {
    val appId = spark.sparkContext.applicationId
    gaugeListeners.keySet.retainAll(java.util.Collections.singleton(appId))
    gaugeListeners.computeIfAbsent(appId, _ => {
      val l = new TaskGaugeListener
      spark.sparkContext.addSparkListener(l)
      l
    })
  }

  def gauges(spark: SparkSession): Gauges = {
    import scala.jdk.CollectionConverters._
    val l = listenerFor(spark)
    val running = registry.values.asScala.count(_.status == "running")
    val byExec = l.byExec.asScala
      .map { case (k, v) => k -> v.get }.filter(_._2 > 0).toMap
    Gauges(registry.size, running, l.total.get, byExec)
  }
}
