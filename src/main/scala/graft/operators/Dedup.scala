package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication suite for large-scale training-data pipelines
  * (BASELINE north star; SURVEY.md §2.F Q6).
  *
  * All variants share one scale shape:
  *   1. per-row signature (narrow, codegen/UDF — no shuffle);
  *   2. candidate generation by *bucket* equi-join (shuffle on bucket
  *      key only — never an all-pairs cross join);
  *   3. exact verification of candidate pairs (cheap, candidates are
  *      a tiny fraction of n^2);
  *   4. keep-first: a doc is dropped iff a smaller-keyed verified
  *      duplicate exists (left-semi against the drop set).
  *
  * Determinism: all hashes are splitmix64 with fixed seeds — no
  * sampling, no fitting, same result on every run and every cluster
  * layout. At 100 TB, step 2's bucket join is the only shuffle; skewed
  * buckets (e.g. boilerplate shingles) should be capped — see
  * `maxBucketSize`.
  */
object Dedup {

  // ---------- signatures (pure functions, usable from any engine) ----------

  private[graft] def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  private def tokenize(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)

  /** Distinct hashed k-token shingles. */
  private[graft] def shingleHashes(text: String, k: Int): Array[Long] = {
    val toks = tokenize(text)
    if (toks.length < k) {
      if (toks.isEmpty) Array.empty
      else Array(splitmix64(toks.mkString(" ").hashCode.toLong))
    } else {
      val out = new scala.collection.mutable.HashSet[Long]
      var i = 0
      while (i + k <= toks.length) {
        var h = 1125899906842597L
        var j = i
        while (j < i + k) { h = h * 31 + toks(j).hashCode; j += 1 }
        out += splitmix64(h)
        i += 1
      }
      out.toArray
    }
  }

  /** MinHash signature: sig(i) = min over shingles of splitmix64(s ^ seed_i). */
  private[graft] def minhashSig(shingles: Array[Long], numHashes: Int, seed: Long): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val s = shingles(i)
      var h = 0
      while (h < numHashes) {
        val v = splitmix64(s ^ (seed + h * 0x9E3779B97F4A7C15L))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over token frequencies. */
  private[graft] def simhash64(text: String): Long = {
    val acc = new Array[Int](64)
    tokenize(text).foreach { tok =>
      val h = splitmix64(tok.hashCode.toLong)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  // ---------- column surface ----------

  def shingleCol(text: Column, k: Int = 3): Column = {
    val f = udf((t: String) => shingleHashes(t, k))
    f(text)
  }

  def minhashCol(shingles: Column, numHashes: Int = 128, seed: Long = 42L): Column = {
    val f = udf((s: Seq[Long]) => minhashSig(s.toArray, numHashes, seed))
    f(shingles)
  }

  def simhashCol(text: Column): Column = {
    val f = udf((t: String) => simhash64(t))
    f(text)
  }

  /** Exact Jaccard over two distinct-element arrays — built-ins, codegen'd. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  // ---------- dedup pipelines ----------

  /** Exact dedup: keep the smallest key per identical (normalized) text.
    * One hash-shuffle; never compares full strings across the wire. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(xxhash64(col(textCol))).orderBy(col(idCol))
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** MinHash + LSH banding near-dedup.
    * numHashes = bands * rowsPerBand. A pair becomes a candidate iff some
    * band of their signatures matches exactly; candidates are verified
    * with exact Jaccard >= threshold on shingles. */
  def minhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      threshold: Double = 0.5,
      seed: Long = 42L,
      maxBucketSize: Int = 10000): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = df
      .withColumn("_sh", shingleCol(col(textCol), k))
      .withColumn("_sig", minhashCol(col("_sh"), numHashes, seed))
      .select(col(idCol), col("_sh"), col("_sig"))

    // band hash: one row per (id, band)
    val banded = sig.select(
      col(idCol), col("_sh"),
      posexplode(bandHashes(col("_sig"), bands, r)).as(Seq("_band", "_bh")))

    val candidates = bucketPairs(banded, idCol, Seq("_band", "_bh"), maxBucketSize,
      carry = Seq("_sh"))

    val verified = candidates
      .filter(jaccard(col("_sh_a"), col("_sh_b")) >= threshold)
      .select(col("_id_b").as("_drop"))
      .distinct()

    df.join(verified, df(idCol) === col("_drop"), "left_anti")
  }

  /** SimHash near-dedup: 4 x 16-bit bands (pigeonhole guarantees any pair
    * with hamming distance <= 3 shares a band), verified by popcount. */
  def simhash(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      maxBucketSize: Int = 10000): DataFrame = {
    val sig = df.withColumn("_sim", simhashCol(col(textCol)))
    val banded = sig.select(col(idCol), col("_sim"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("_sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("_band", "_bh")))
    val candidates = bucketPairs(banded, idCol, Seq("_band", "_bh"), maxBucketSize,
      carry = Seq("_sim"))
    val verified = candidates
      .filter(bit_count(col("_sim_a").bitwiseXOR(col("_sim_b"))) <= maxHamming)
      .select(col("_id_b").as("_drop")).distinct()
    df.join(verified, df(idCol) === col("_drop"), "left_anti")
  }

  /** N-gram Jaccard near-dedup — fully exact: inverted index on shingle
    * hash, shared-count per pair, Jaccard from exact set sizes. */
  def ngramJaccard(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val sh = df.select(col(idCol), shingleCol(col(textCol), k).as("_sh"))
      .withColumn("_n", size(col("_sh")))
    val inv = sh.select(col(idCol), col("_n"), explode(col("_sh")).as("_g"))
    val a = inv.select(col(idCol).as("_id_a"), col("_n").as("_n_a"), col("_g"))
    val b = inv.select(col(idCol).as("_id_b"), col("_n").as("_n_b"), col("_g"))
    val shared = a.join(b, Seq("_g")).filter(col("_id_a") < col("_id_b"))
      .groupBy("_id_a", "_id_b", "_n_a", "_n_b").agg(count(lit(1)).as("_shared"))
    val verified = shared.filter(
      col("_shared").cast("double") /
        (col("_n_a") + col("_n_b") - col("_shared")).cast("double") >= threshold)
      .select(col("_id_b").as("_drop")).distinct()
    df.join(verified, df(idCol) === col("_drop"), "left_anti")
  }

  /** Embedding-cosine near-dedup: hyperplane-LSH buckets, exact cosine
    * verify within buckets (multi-band so near pairs are not missed). */
  def embeddingCosine(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.9,
      planesPerBand: Int = 8,
      bands: Int = 8,
      seed: Long = 42L,
      maxBucketSize: Int = 10000): DataFrame = {
    val banded = df.select(col(idCol), col(vecCol).as("_v"),
      posexplode(Ann.bandedSignatures(col(vecCol), planesPerBand, bands, seed))
        .as(Seq("_band", "_bh")))
    val candidates = bucketPairs(banded, idCol, Seq("_band", "_bh"), maxBucketSize,
      carry = Seq("_v"))
    val verified = candidates
      .filter(graft.functions.vectors.cosine(col("_v_a"), col("_v_b")) >= threshold)
      .select(col("_id_b").as("_drop")).distinct()
    df.join(verified, df(idCol) === col("_drop"), "left_anti")
  }

  // ---------- helpers ----------

  /** Slice a signature array into band hashes (one long per band). */
  private def bandHashes(sig: Column, bands: Int, r: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(slice(sig, b * r + 1, r))
    }: _*)

  /** Candidate pairs (id_a < id_b) sharing a bucket; carries extra columns
    * suffixed _a/_b. Buckets above `maxBucketSize` are dropped with the
    * skew-safety valve (boilerplate buckets would otherwise square). */
  private def bucketPairs(
      banded: DataFrame,
      idCol: String,
      bucketCols: Seq[String],
      maxBucketSize: Int,
      carry: Seq[String]): DataFrame = {
    val sized = banded
      .withColumn("_bsz", count(lit(1)).over(
        Window.partitionBy(bucketCols.map(col): _*)))
      .filter(col("_bsz") <= maxBucketSize)
    val aSide = sized.select(
      (bucketCols.map(col) :+ col(idCol).as("_id_a")) ++ carry.map(c => col(c).as(s"${c}_a")): _*)
    val bSide = sized.select(
      (bucketCols.map(col) :+ col(idCol).as("_id_b")) ++ carry.map(c => col(c).as(s"${c}_b")): _*)
    aSide.join(bSide, bucketCols).filter(col("_id_a") < col("_id_b"))
      .dropDuplicates("_id_a", "_id_b")
  }
}
