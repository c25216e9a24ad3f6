package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy operators for training-data pipelines: keyed
  * pseudonymization and re-identification auditing.
  *
  * The PII story so far redacts spans ([[TextAnalytics.redactPii]])
  * and erases ids (right-to-be-forgotten, [[graft.streaming.StreamOps
  * .forget]]); between the two sits PSEUDONYMIZATION — replace an
  * identifier with a keyed token that is (a) stable, so joins,
  * group-bys and dedup keyed on it still work across tables and
  * batches, (b) one-way without the key, (c) rotatable: a new key
  * yields an unlinkable new token space. That is tokenization, not
  * encryption: nothing decrypts, the token IS the working id.
  *
  *  - [[hmacSha256]] / [[tokenizeHmac]] — real RFC 2104 HMAC-SHA256
  *    (javax.crypto), spec-proven against the RFC 4231 test vectors.
  *  - [[tokenizePortable]] — a keyed digest composed ENTIRELY of
  *    string-domain sha256 steps (`sha256(k_out ‖ sha256(k_in ‖ msg))`
  *    with domain-separated subkeys), so any engine with a string
  *    sha256 replays it bit-for-bit — this is what lets the q195 gate
  *    hash-match DuckDB. Not RFC-HMAC (the inner digest travels as
  *    hex, not raw bytes) but the same nested-keyed structure;
  *    equally one-way, equally stable. Both run inside one projection
  *    — tokenization of a 100 TB corpus is a map, no shuffle.
  *  - [[kAnonymityAudit]] — the re-identification risk report: every
  *    quasi-identifier combination shared by FEWER than k rows (the
  *    groups where "anonymized" data still points at individuals —
  *    Sweeney's k-anonymity, the measure privacy review asks for
  *    before a corpus ships). One group-by; pair with [[generalize]]
  *    to coarsen a numeric quasi-identifier until the audit passes.
  */
object Privacy {

  /** RFC 2104 HMAC-SHA256. */
  def hmacSha256(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }

  /** Hex HMAC-SHA256 token column (real RFC HMAC; not replayable by
    * engines whose sha256 is string-only — use [[tokenizePortable]]
    * for cross-engine gates). Null-safe: null in, null out. */
  def tokenizeHmac(c: Column, key: String): Column = {
    val kb = key.getBytes("UTF-8")
    val f = udf((s: String) =>
      if (s == null) null
      else hmacSha256(kb, s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)
    f(c.cast("string"))
  }

  /** Engine-portable keyed digest token: subkeys are domain-separated
    * hex digests of the key, and the inner digest travels as hex —
    * every step stays in the string domain, codegen'd, no UDF. */
  def tokenizePortable(c: Column, key: String): Column = {
    val kIn = sha256Hex(key + "|inner")
    val kOut = sha256Hex(key + "|outer")
    sha2(concat(lit(kOut), sha2(concat(lit(kIn), c.cast("string")), 256)), 256)
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Fixed-width generalization of a numeric quasi-identifier:
    * value → "lo-hi" range label (lo inclusive, hi exclusive), the
    * coarsening knob that trades utility for anonymity. Exact integer
    * arithmetic — replays anywhere. */
  def generalize(c: Column, width: Long): Column = {
    require(width >= 1, "width must be >= 1")
    val lo = (c.cast("long") - pmod(c.cast("long"), lit(width)))
    concat(lo.cast("string"), lit("-"), (lo + lit(width)).cast("string"))
  }

  /** Quasi-identifier combinations with FEWER than `k` rows — the
    * groups where the "anonymized" release still singles people out.
    * Returns (quasiCols…, n) for the failing groups; an empty result
    * IS the k-anonymity certificate. */
  def kAnonymityAudit(df: DataFrame, quasiCols: Seq[Column],
      names: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && quasiCols.size == names.size,
      "need aligned quasi columns and names")
    df.groupBy(quasiCols.zip(names).map { case (c, n) => c.as(n) }: _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < lit(k))
  }

  /** Differentially-private count release — the third leg of the
    * privacy family (tokenize keeps JOINS working, k-anonymity audits
    * a release, dpCounts PUBLISHES aggregate counts): per-group count
    * + Laplace(1/ε) noise via the inverse CDF, with optional
    * `minCount` suppression of small groups before release (publish
    * thresholds compose with DP in every real release pipeline).
    *
    * The noise is DERANDOMIZED for reproducible pipelines (and the
    * oracle): the uniform draw is the first 48 bits of
    * sha256(seed|groupkey) — every engine computes the identical
    * draw, re-running a release is idempotent, and distinct groups
    * get independent draws. (True DP against an adversary who knows
    * `seed` requires a secret seed — the caller's key-management
    * problem, same as [[tokenizeHmac]]'s.) `u = (u48+0.5)/2^48`
    * dodges the u=0 (infinite noise) and u=0.5 (sign boundary)
    * edges exactly. One aggregation, one projection — no extra pass
    * at any corpus size. */
  def dpCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
      seed: String, minCount: Long = 0L): DataFrame = {
    require(groupCols.nonEmpty, "dpCounts needs group columns")
    require(epsilon > 0.0, s"epsilon must be positive, got $epsilon")
    val grouped = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= lit(minCount))
    val key = concat_ws("|", groupCols.map(c => col(c).cast("string")): _*)
    val tok = sha2(concat(lit(seed + "|"), key), 256)
    val uCol = (conv(substring(tok, 1, 12), 16, 10).cast("long").cast("double") +
      lit(0.5)) / lit(281474976710656.0) // 2^48
    val c = uCol - lit(0.5)
    val noise = lit(-1.0 / epsilon) * signum(c) *
      log(lit(1.0) - lit(2.0) * abs(c))
    grouped.withColumn("released", col("n").cast("double") + noise)
      .select(groupCols.map(col) :+ col("released"): _*)
  }
}
