package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: time a subset of SparkEntry.queries (args = names; empty
  * = all) against SPARK_GRAFT_SF_DIR. Not part of the driver contract. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"[profile] $name%-24s cold=$cold%7.2f s  warm=$warm%7.2f s  rows=$n")
    }
    spark.stop()
  }
}
