package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev harness for optimization rounds: run named queries with Bench's
  * exact session/timing discipline and print a PER-JOB breakdown
  * (job wall, stage task-time, shuffle bytes, callsite) so the time
  * inside a multi-job lifecycle gate is attributable to its pieces.
  * Not part of the driver contract. */
object ProfileJobs {
  private final case class JobRec(id: Int, var site: String = "",
    var startMs: Long = 0L, var endMs: Long = 0L,
    var taskTimeMs: Long = 0L, var shufWrite: Long = 0L,
    var shufRead: Long = 0L, var inBytes: Long = 0L, var nStages: Int = 0,
    var stageNames: List[String] = Nil)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Bench-identical warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count() catch { case _: Throwable => }
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (recording) {
        val r = JobRec(e.jobId)
        r.startMs = e.time
        r.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(e.jobId, r)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.endMs = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val jid = stageToJob.getOrDefault(si.stageId, -1)
        val r = jobs.get(jid)
        if (r != null) {
          r.taskTimeMs += si.taskMetrics.executorRunTime
          r.shufWrite += si.taskMetrics.shuffleWriteMetrics.bytesWritten
          r.shufRead += si.taskMetrics.shuffleReadMetrics.totalBytesRead
          r.inBytes += si.taskMetrics.inputMetrics.bytesRead
          r.nStages += 1
          r.stageNames ::= s"${si.name.take(50)}[${si.numTasks}t]"
        }
      }
    })
    val names = args.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // one warm pass (Bench's untimed warm-up)
      try force(fn(spark, sfDir)) catch { case e: Throwable =>
        println(s"[profilejobs] $name WARM-FAIL: $e") }
      // Bench's debris discipline
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      System.gc()
      jobs.clear(); stageToJob.clear()
      recording = true
      val t0 = System.nanoTime()
      try force(fn(spark, sfDir)) catch { case e: Throwable =>
        println(s"[profilejobs] $name FAIL: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      recording = false
      Thread.sleep(300) // let listener drain
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.sortBy(_.id)
      println(f"\n==== $name wall=$wall%.3f s jobs=${recs.size} ====")
      val gapTotal = {
        var prevEnd = 0L; var gap = 0L
        recs.foreach { r =>
          if (prevEnd > 0 && r.startMs > prevEnd) gap += r.startMs - prevEnd
          prevEnd = math.max(prevEnd, r.endMs)
        }
        gap
      }
      val jobSum = recs.map(r => r.endMs - r.startMs).sum / 1e3
      println(f"  job-wall-sum=$jobSum%.3f s  inter-job-gap=${gapTotal / 1e3}%.3f s")
      recs.sortBy(r => -(r.endMs - r.startMs)).take(40).foreach { r =>
        println(f"  job=${r.id}%4d wall=${(r.endMs - r.startMs) / 1e3}%7.3f s " +
          f"taskTime=${r.taskTimeMs / 1e3}%8.3f s stages=${r.nStages}%2d " +
          f"in=${r.inBytes / 1e6}%8.1f MB sw=${r.shufWrite / 1e6}%7.1f MB " +
          f"sr=${r.shufRead / 1e6}%7.1f MB  ${r.stageNames.reverse.mkString(" | ").take(110)}")
      }
    }
    spark.stop()
  }
}
