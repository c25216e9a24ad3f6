package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-size estimation from count-min SIDECARS — the AMS/CMS
  * inner-product estimator (Cormode & Muthukrishnan §4.2; Alon-Matias-
  * Szegedy F2 lineage).
  *
  * Planning a 100 TB join, the question "how many rows come out?"
  * decides broadcast vs shuffle, salting, and AQE hints — and
  * answering it by running the join defeats the purpose. The CMS
  * identity: for sketches of the two sides' key multisets sharing
  * (width, depth, seed), `min_d Σ_b cnt1[d,b]·cnt2[d,b]` estimates
  * `|A ⋈ B| = Σ_k a_k·b_k` with the one-sided contract
  *
  *   true ≤ estimate ≤ true + (e/width)·N1·N2   w.p. 1 − (1/e)^depth
  *
  * (over-estimates only — hash collisions add cross terms, never
  * subtract). Each sketch is a (depth × width) integer table built
  * with ONE aggregation (map-side combine does the partition-local
  * sketching; the shuffle moves ≤ depth·width rows), persists as a
  * KB-sized DataFrame, and MERGES by adding cells — so per-batch
  * sketches roll up corpus-wide like every sketch sidecar here
  * ([[KllQuantiles]], [[FrequentItems]], theta). Deterministic:
  * seeded xxhash64 rows, integer cells, no sampling.
  */
object JoinEstimate {

  /** The (d, b, cnt) count-min table of `keyCol`'s multiset: depth
    * rows of width buckets, bucket = xxhash64(key, d, seed) mod
    * width. Missing cells are zero (sparse). */
  def cmsTable(df: DataFrame, keyCol: String, width: Int = 1024,
      depth: Int = 5, seed: Long = 42L): DataFrame = {
    require(width >= 2 && depth >= 1, "width >= 2, depth >= 1 required")
    df.select(col(keyCol).as("_k"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"))
      .select(col("d"),
        pmod(xxhash64(col("_k"), col("d"), lit(seed)), lit(width.toLong))
          .cast("int").as("b"))
      .groupBy(col("d"), col("b")).agg(count(lit(1)).as("cnt"))
  }

  /** Merge per-batch tables built with the SAME (width, depth, seed):
    * cells add. */
  def mergeTables(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(col("d"), col("b")).agg(sum(col("cnt")).as("cnt"))

  /** Estimated inner product Σ_k a_k·b_k — the equi-join output
    * cardinality of the two sketched sides. Driver-side result; the
    * work is a (depth·width)-row join of two KB tables, the base data
    * is never touched. */
  def estimateJoinSize(cms1: DataFrame, cms2: DataFrame): Long = {
    // the inner product accumulates in DECIMAL(38,0), not long: at the
    // 10^12-row planning scale this module exists for, per-cell counts
    // reach ~1e9 and a single product is ~1e18 — a 1024-term LONG sum
    // wraps silently and the min-over-depth then picks the wrapped row.
    // 38 digits carry width·(N1/width)·(N2/width) for any N this side
    // of 1e18 rows. Beyond that, a per-depth sum can exceed 38 digits;
    // try_sum makes that NULL under BOTH ANSI settings (plain sum
    // throws under ANSI, silently NULLs otherwise) — and an all-NULL
    // result must not read as "empty join = 0". NULL-from-empty and
    // NULL-from-overflow are told apart by counting: zero depth rows
    // = disjoint sketches = 0; a NULL depth among non-NULLs is
    // correctly dominated by min (its true value exceeds every
    // representable one); ALL depths NULL = every estimate overflowed
    // = clamp to Long.MaxValue, never 0. The per-cell PRODUCT needs no
    // guard: long·long < 8.6e37 fits decimal(38,0) by construction.
    val per = cms1.select(col("d"), col("b"), col("cnt").as("_c1"))
      .join(cms2.select(col("d"), col("b"), col("cnt").as("_c2")),
        Seq("d", "b"))
      .groupBy(col("d"))
      .agg(try_sum(col("_c1").cast("decimal(38,0)") *
        col("_c2").cast("decimal(38,0)")).as("_ip"))
      .agg(count(lit(1)).as("_depths"), count(col("_ip")).as("_finite"),
        min(col("_ip")).as("_min"))
      .head()
    if (per.getLong(0) == 0L) 0L // no overlapping cells at any depth
    else if (per.getLong(1) == 0L) Long.MaxValue // every depth overflowed
    else {
      val ip = per.getDecimal(2).toBigInteger
      if (ip.compareTo(java.math.BigInteger.valueOf(Long.MaxValue)) > 0)
        Long.MaxValue
      else ip.longValueExact()
    }
  }

  /** The published error ceiling for this sketch geometry:
    * (e/width)·N1·N2, where N are the sides' row counts (readable
    * from the sketches themselves: Σ cnt / depth). */
  def errorBound(cms1: DataFrame, cms2: DataFrame, width: Int,
      depth: Int): Double = {
    // coalesce: an EMPTY sketch (zero rows sketched → no cells) sums
    // to NULL, and getLong(0) on it would throw instead of bounding 0
    def n(c: DataFrame): Double =
      c.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0)
        .toDouble / depth
    math.E / width * n(cms1) * n(cms2)
  }
}
