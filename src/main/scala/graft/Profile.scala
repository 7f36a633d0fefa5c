package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool: run declared queries under a SparkListener and report,
  * per query, wall seconds, Spark job count, stage count, total task
  * time, shuffle bytes and spill — the guide §1 "where is the time
  * going" breakdown the UI would give, in headless form. Not part of
  * the driver contract.
  *
  * Usage: runMain graft.Profile <sfDir> <namePrefix>[,<namePrefix>...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: Profile <sfDir> <prefixes>")
    val Array(sfDir, prefixCsv) = args
    val prefixes = prefixCsv.split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.maxPlanStringLength", "8192")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskMs = 0L
    @volatile var shufWrite = 0L
    @volatile var shufRead = 0L
    @volatile var spill = 0L
    val jobStarts = mutable.Map[Int, Long]()
    val jobSites = mutable.Map[Int, String]()
    val jobWall = mutable.ArrayBuffer[(Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        synchronized {
          jobs += 1; jobStarts(js.jobId) = js.time
          jobSites(js.jobId) = Option(
            js.properties.getProperty("callSite.short")).getOrElse("?")
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        synchronized {
          jobStarts.remove(je.jobId).foreach(t0 =>
            jobWall += ((je.jobId, je.time - t0)))
        }
      override def onStageCompleted(
          sc: SparkListenerStageCompleted): Unit = synchronized {
        stages += 1
        val i = sc.stageInfo
        tasks += i.numTasks
        taskMs += i.taskMetrics.executorRunTime
        shufWrite += i.taskMetrics.shuffleWriteMetrics.bytesWritten
        shufRead += i.taskMetrics.shuffleReadMetrics.totalBytesRead
        spill += i.taskMetrics.diskBytesSpilled
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    // warm-up at sf0.001 (bench methodology)
    ordered.foreach { case (_, fn) =>
      try run(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
    }
    ordered.foreach { case (name, fn) =>
      synchronized {
        jobs = 0; stages = 0; tasks = 0; taskMs = 0
        shufWrite = 0; shufRead = 0; spill = 0; jobWall.clear()
      }
      val t0 = System.nanoTime()
      run(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      // drain listener events before reading counters
      org.apache.spark.sql.GraftSqlBridge.waitListenerBus(spark)
      val slowest = jobWall.sortBy(-_._2).take(8)
        .map { case (id, ms) =>
          s"j$id=${ms}ms[${jobSites.getOrElse(id, "?")}]" }.mkString(" ")
      val bySite = jobWall.groupBy(j => jobSites.getOrElse(j._1, "?"))
        .map { case (s, js) => (s, js.size, js.map(_._2).sum) }
        .toSeq.sortBy(-_._3).take(10)
        .map { case (s, n, ms) => s"$s n=$n ${ms}ms" }.mkString(" | ")
      println(f"[profile] $name%-38s wall=$wall%7.2fs jobs=$jobs%3d " +
        f"stages=$stages%4d tasks=$tasks%5d taskTime=${taskMs / 1000.0}%8.1fs " +
        f"shufW=${shufWrite / 1e6}%8.1fMB shufR=${shufRead / 1e6}%8.1fMB " +
        f"spill=${spill / 1e6}%6.1fMB")
      println(s"[profile]   slowest jobs: $slowest")
      println(s"[profile]   by callsite: $bySite")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(100)
    }
    spark.stop()
  }
}
