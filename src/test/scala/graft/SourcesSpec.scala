package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source robustness: the error-row channel for malformed input
  * (the Spark analogue of the reference's explicit extraction errors,
  * streamlit_app.py:70-71 — bad rows are surfaced, not silently lost). */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("PERMISSIVE json keeps corrupt rows in _corrupt_record; FAILFAST throws") {
    val dir = Files.createTempDirectory("graft_json")
    Files.write(dir.resolve("a.json"), java.util.Arrays.asList(
      """{"id": 1, "v": 1.5}""",
      """{"id": 2, "v": 2.5}""",
      """{"id": oops not json""",
      """{"id": 3, "v": 3.5}"""))
    val schema = "id LONG, v DOUBLE, _corrupt_record STRING"
    val df = spark.read.schema(schema).json(dir.toString).cache()
    assert(df.count() == 4)
    assert(df.filter($"_corrupt_record".isNotNull).count() == 1)
    assert(df.filter($"id".isNotNull).count() == 3)
    df.unpersist()

    intercept[org.apache.spark.SparkException] {
      spark.read.schema("id LONG, v DOUBLE")
        .option("mode", "FAILFAST").json(dir.toString).collect()
    }
  }

  test("CSV short/bad rows: PERMISSIVE pads with nulls, no rows lost") {
    val dir = Files.createTempDirectory("graft_csv")
    // short rows are padded, bad cells are nulled — rows are never
    // silently dropped under the default mode
    Files.write(dir.resolve("a.csv"), java.util.Arrays.asList(
      "1,alpha,1.5", "2,beta", "3,gamma,not_a_number", "4,delta,3.5"))
    val schema = "id LONG, tag STRING, v DOUBLE"
    val permissive = spark.read.schema(schema).csv(dir.toString)
    assert(permissive.count() == 4)
    assert(permissive.filter($"v".isNull).count() == 2)
    assert(permissive.filter($"id".isNotNull).count() == 4)
  }
}
