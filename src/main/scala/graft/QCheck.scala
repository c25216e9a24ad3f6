package graft
import org.apache.spark.sql.SparkSession

/** Dev harness: print the actual result rows of the named queries at
  * EVERY fixture SF — the cheap way to confirm a contract query
  * (recall_ok etc.) holds at all scales before wiring its oracle. Not
  * part of the driver contract. */
object QCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1"); name <- args) {
      val rows = SparkEntry.queries(name)(spark, s"/root/testdata/$sf").collect()
      println(s"[qcheck] $sf $name -> ${rows.mkString(" | ")}")
    }
    spark.stop()
  }
}
