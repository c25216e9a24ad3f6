package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Dev harness for optimization-round evidence: run named queries with
  * Bench's session config and dump the FORMATTED physical plan of (a)
  * the gate's final DataFrame and (b) every Spark SQL action the gate
  * executed on the way (index builds, sidecar writes, probes — where
  * the write-leg plan changes live), via a QueryExecutionListener.
  * Output: one text file per query under the directory in arg 0.
  * Not part of the driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val names = args.tail.toSeq
    new java.io.File(outDir).mkdirs()
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
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(String, String)]())
    @volatile var recording = false
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = if (recording) {
        plans.add((funcName, qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))))
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    names.foreach { name =>
      plans.clear()
      recording = true
      val df = SparkEntry.queries(name)(spark, sfDir)
      val finalPlan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      df.write.format("noop").mode("overwrite").save()
      recording = false
      Thread.sleep(800) // let the listener bus drain
      val sb = new StringBuilder
      sb.append(s"==== $name: FINAL DataFrame plan ====\n")
      sb.append(finalPlan).append("\n")
      import scala.jdk.CollectionConverters._
      plans.asScala.zipWithIndex.foreach { case ((fn, p), i) =>
        sb.append(s"\n==== $name: executed action #$i ($fn) ====\n")
        sb.append(p).append("\n")
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"), sb.toString)
      println(s"[plandump] wrote $outDir/$name.txt (${plans.size} actions)")
    }
    spark.stop()
  }
}
