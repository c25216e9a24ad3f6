package graft

import graft.functions.vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def manualCos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
  }

  test("cosine matches manual computation on double arrays") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, -5.0, 6.0))).toDF("a", "b")
    val got = df.select(vectors.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(got - manualCos(Seq(1, 2, 3), Seq(4, -5, 6))) < 1e-12)
  }

  test("cosine on float arrays from parquet embeddings") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val rows = emb.filter($"vec_id" < 2).select($"embedding").as[Seq[Float]].collect()
    val expected = manualCos(rows(0).map(_.toDouble), rows(1).map(_.toDouble))
    val got = emb.filter($"vec_id" === 0)
      .crossJoin(emb.filter($"vec_id" === 1).select($"embedding".as("b")))
      .select(vectors.cosine($"embedding", $"b")).as[Double].head()
    assert(math.abs(got - expected) < 1e-9)
  }

  test("self-cosine is 1, orthogonal is 0, opposite is -1; zero-norm is 0") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 5.0), 0.0),
      (Seq(1.0, 2.0), Seq(-1.0, -2.0), -1.0),
      (Seq(0.0, 0.0), Seq(1.0, 1.0), 0.0)
    ).toDF("a", "b", "want")
    df.select(vectors.cosine($"a", $"b").as("got"), $"want").as[(Double, Double)]
      .collect().foreach { case (got, want) => assert(math.abs(got - want) < 1e-12) }
  }

  test("null inputs yield null (nullIntolerant)") {
    val df = Seq((Some(Seq(1.0, 2.0)), Option.empty[Seq[Double]])).toDF("a", "b")
    assert(df.select(vectors.cosine($"a", $"b")).head().isNullAt(0))
  }

  test("dot and l2_norm agree with cosine identity") {
    val df = Seq((Seq(3.0, 4.0), Seq(5.0, 12.0))).toDF("a", "b")
    val (d, na, nb, c) = df.select(
      vectors.dot($"a", $"b"), vectors.l2Norm($"a"), vectors.l2Norm($"b"),
      vectors.cosine($"a", $"b")).as[(Double, Double, Double, Double)].head()
    assert(math.abs(d / (na * nb) - c) < 1e-12)
    assert(na == 5.0 && nb == 13.0 && d == 63.0)
  }

  test("SQL registration works") {
    vectors.register(spark)
    val got = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").as[Double].head()
    assert(got == 1.0)
  }

  test("expression participates in whole-stage codegen") {
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.select(vectors.cosine($"embedding", $"embedding").as("s")).filter($"s" > 0.5)
    // whole-stage-codegen stages print as "*(n)" prefixes
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cosine_similarity"), s"no codegen in:\n$plan")
  }

  test("l2_normalize: unit norm, zero-vector passthrough, null element => null row") {
    // plain arrays normalize; a zero vector passes through
    val df = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0)).toDF("v")
    val out = df.select(vectors.l2Normalize($"v").as("n")).as[Seq[Double]].collect().toSeq
    assert(out == Seq(Seq(0.6, 0.8), Seq(0.0, 0.0)))
    // a null ELEMENT must yield a null result row (the pre-expression
    // HOF plan propagated element nulls; reading the slot as 0.0 would
    // silently change results) — exercised both interpreted and codegen
    val nullable = Seq(
      (1L, Some(Seq(Option(3.0), Option(4.0)))),
      (2L, Some(Seq(Option(1.0), None))),
      (3L, Option.empty[Seq[Option[Double]]])
    ).toDF("id", "v")
    val got = nullable.select($"id", vectors.l2Normalize($"v").as("n"))
      .as[(Long, Option[Seq[Double]])].collect().toMap
    assert(got(1L) == Some(Seq(0.6, 0.8)))
    assert(got(2L).isEmpty, "null element must produce a null row, not garbage")
    assert(got(3L).isEmpty, "null array stays null (nullIntolerant)")
    // non-nullable-element inputs keep the fast path AND codegen
    val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    val q = emb.select(vectors.l2Normalize($"embedding").as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_l2_normalize"), s"no codegen in:\n$plan")
    assert(q.count() == emb.count())
  }

  test("unicode_normalize: composes NFC, folds NFKC, null-safe, codegen'd") {
    import graft.functions.textnorm
    val decomposed = "caf" + "e\u0301" + " u\u0308ber"     // e+U+0301, u+U+0308
    val composed = "café über"
    val df = Seq(Some(decomposed), Some("ab"), None).toDF("s")
    val out = df.select(textnorm.nfc($"s").as("n")).as[Option[String]].collect().toSeq
    assert(out == Seq(Some(composed), Some("ab"), None))
    // NFC is idempotent; NFKC folds compatibility forms (fi-ligature)
    assert(Seq(composed).toDF("s").select(textnorm.nfc($"s")).as[String].head() == composed)
    assert(Seq("ﬁsh").toDF("s")
      .select(textnorm.normalize($"s", "NFKC")).as[String].head() == "fish")
    // forTraining: NFC + control-char strip + whitespace collapse + trim
    assert(Seq("  a\u0000b \u0007x\t\tc  " + decomposed + " ").toDF("s")
      .select(textnorm.forTraining($"s")).as[String].head() == s"ab x c $composed")
    // stays inside whole-stage codegen (parquet-backed input — a local
    // relation constant-folds the projection into a LocalTableScan)
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val q = docs.select(textnorm.nfc($"text").as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [unicode_normalize"), s"no codegen in:\n$plan")
    // invalid form rejected
    intercept[IllegalArgumentException] { textnorm.normalize($"s", "NFX") }
  }
  test("fix_mojibake: repairs utf8-as-cp1252, strictness guards clean text, double layer unwinds, codegen'd") {
    import graft.functions.{textnorm, MojibakeRepair}
    // the corruption a sloppy mis-decoder applies: UTF-8 bytes read
    // as cp1252 (undefined bytes passed through as C1 controls)
    def corrupt(s: String): String = MojibakeRepair.corruptDecode(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val clean = "café déjà vu — naïve façade über señal"
    val bad = corrupt(clean)
    assert(bad != clean)
    assert(MojibakeRepair.fix(bad) == clean)
    // the strict-decode guard: clean accented text round-trips to
    // invalid UTF-8 bytes (a lone 0xE9) and passes through untouched
    assert(MojibakeRepair.fix(clean) == clean)
    assert(MojibakeRepair.fix("plain ascii only") == "plain ascii only")
    // doubly-corrupted unwinds both layers
    assert(MojibakeRepair.fix(corrupt(corrupt(clean))) == clean)
    // cp1252-unencodable content (emoji, CJK) is never touched
    assert(MojibakeRepair.fix("ok 😀 fine") == "ok 😀 fine")
    assert(MojibakeRepair.fix("日本語テスト") == "日本語テスト")
    // column path: null-safe, codegen'd, interpreted == generated
    val out = Seq(Some(bad), Some(clean), None).toDF("s")
      .select(textnorm.fixMojibake($"s")).as[Option[String]].collect().toSeq
    assert(out == Seq(Some(clean), Some(clean), None))
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    val q = docs.select(textnorm.fixMojibake($"text").as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [fix_mojibake"), s"no codegen in:\n$plan")
    // ASCII corpus is a fixpoint
    assert(docs.filter(textnorm.fixMojibake($"text") =!= $"text").count() == 0)
  }

  test("jaro_winkler: known values, duckdb conventions, codegen == interpreted") {
    import graft.functions.{strings, StringSimilarityUtil => U}
    // Winkler's canonical examples + the convention probes that were
    // verified against DuckDB's jaro_winkler_similarity
    assert(math.abs(U.jaroWinkler("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(U.jaroWinkler("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(U.jaroWinkler("abc", "abc") == 1.0)
    assert(U.jaroWinkler("", "") == 0.0)      // rapidfuzz/duckdb convention
    assert(U.jaroWinkler("a", "") == 0.0)
    assert(U.jaroWinkler("ab", "ba") == 0.0)  // window 0: no matches
    // boost only above the 0.7 threshold (prefix-sharing low-sim pair)
    assert(U.jaroWinkler("aaxxxxxx", "aayyyyyy") == U.jaro("aaxxxxxx", "aayyyyyy"))
    // expression path: codegen result == static eval, null-safe
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      (null, "x"), ("y", null)).toDF("a", "b")
    val got = df.select(strings.jaroWinkler($"a", $"b")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).contains(U.jaroWinkler("martha", "marhta")))
    assert(got(1).contains(U.jaroWinkler("dixon", "dicksonx")))
    assert(got(2).isEmpty && got(3).isEmpty)
  }
}
