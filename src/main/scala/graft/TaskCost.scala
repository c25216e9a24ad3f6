package graft
import org.apache.spark.sql.SparkSession

/** Dev micro-harness: per-task fixed cost on this host — times trivial
  * N-task jobs (steady state) at several N. Not part of the contract. */
object TaskCost {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    // warm
    (1 to 3).foreach(_ => sc.parallelize(1 to 1000, 32).map(_ + 1).count())
    Seq(1, 4, 8, 32, 64).foreach { n =>
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        sc.parallelize(1 to n, n).map(_ + 1).count()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"RDD    n=$n%3d tasks: median=${times.sorted.apply(2)}%8.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
    }
    // DataFrame shuffle: groupBy over n post-shuffle partitions
    Seq(1, 32).foreach { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n)
      val df = spark.range(0, 10000, 1, 4).selectExpr("id % 100 as k", "id as v")
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.groupBy("k").count().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"DF-agg n=$n%3d parts: median=${times.sorted.apply(2)}%8.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
    }
    // repartition to 32 + UDF, vs 1-partition UDF
    val udf1 = org.apache.spark.sql.functions.udf((s: Long) => { var x = s; var i = 0; while (i < 200000) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }; x })
    val base = spark.range(0, 2000, 1, 1).toDF("id")
    Seq(false, true).foreach { fan =>
      val src = if (fan) base.repartition(32) else base
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        src.select(udf1(org.apache.spark.sql.functions.col("id"))).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"UDF fan=$fan: median=${times.sorted.apply(2)}%8.1f ms  all=${times.map(t => f"$t%.0f").mkString(",")}")
    }
    spark.stop()
  }
}
