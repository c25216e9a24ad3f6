package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing (SURVEY.md §2 "partitioning &
  * shuffle" row): two tables bucketed+sorted on the join key join with
  * ZERO shuffle exchanges — the layout a 100 TB fact/fact join needs,
  * where re-shuffling either side per query would dominate cost. */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed+sorted tables sort-merge-join with no Exchange") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("ord_bucketed")

    // force the shuffle-join path: at test scale the planner would
    // broadcast the tiny side (and skip bucketed reading entirely);
    // at fact/fact scale neither side is broadcastable
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_bucketed").join(
        spark.table("ord_bucketed"),
        spark.table("li_bucketed")("l_orderkey") === spark.table("ord_bucketed")("o_orderkey"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      // and it still returns the right rows
      assert(joined.count() ==
        li.join(ord, li("l_orderkey") === ord("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("partitioned layout prunes partitions at the scan (PartitionFilters)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = one.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("event_type"), "pruning predicate must be a partition filter")
    // only the click partition's rows are read
    val expected = spark.read.parquet(s"${TestSpark.sf0001}/events.parquet")
      .filter(col("event_type") === "click").count()
    assert(one.count() == expected)
  }
}
