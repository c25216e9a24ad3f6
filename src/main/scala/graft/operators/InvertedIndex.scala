package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase search.
  *
  * BM25/TF-IDF ([[TextAnalytics]]) rank by bag-of-words; an exact
  * PHRASE query ("data processing", quoted search) needs token
  * POSITIONS. The naive plan — `text LIKE '%phrase%'` — scans every
  * byte of a 100 TB corpus per query; the index plan touches only the
  * phrase's own tokens' postings: filter the postings to the K phrase
  * tokens (predicate pushdown into the postings scan — at scale the
  * postings persist partitioned by token hash so this prunes
  * partitions), then K-1 equijoins on (doc, position) check
  * adjacency. Work is proportional to the RAREST token's posting list,
  * not the corpus.
  *
  * Tokenization is the engine's standard one (lowercase,
  * `[^a-z0-9]+` splits, empties dropped) so phrase semantics line up
  * with BM25/dedup — and the DuckDB oracle replays it token-for-token.
  */
object InvertedIndex {

  /** One row per token occurrence: (doc, pos, token), pos 1-based in
    * the filtered token stream. */
  def postings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        posexplode(filter(split(lower(col(textCol)), "[^a-z0-9]+"),
          t => t =!= "")))
      .select(col("doc"), (col("pos") + 1).as("pos"), col("col").as("token"))

  // ---------- persisted index (the at-scale layout) ----------
  //
  // q161's per-query postings build reads the whole corpus once per
  // phrase; the PERSISTED index pays that scan once at build time and
  // then serves every phrase query from the token-hash-bucketed layout
  // below: postings partition by `_tbkt = xxhash64(token) % buckets`,
  // so a probe's `isin` over its tokens' buckets is a PARTITION filter
  // — directories that hold none of the phrase's tokens are never
  // opened, and within the surviving buckets the token equality pushes
  // into the parquet scan. Query I/O is proportional to the phrase
  // tokens' bucket shares of the corpus, never the corpus. The bucket
  // count is part of the layout, so it persists in `_META`
  // ([[LayoutMeta]], the Hamming-index discipline): probes resolve it
  // from the written record and an explicitly conflicting value throws
  // instead of pruning the wrong directories.

  private def bucketCol(buckets: Int) =
    pmod(xxhash64(col("token")), lit(buckets.toLong)).cast("int").as("_tbkt")

  /** Build (full rewrite) the persisted postings index at `path`. */
  def writeIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1, "buckets must be >= 1")
    postings(df, idCol, textCol)
      .withColumn("_tbkt", bucketCol(buckets))
      // one narrow shuffle on the partition column buys ONE file per
      // bucket directory; a direct partitionBy write emits up to
      // tasks x buckets files
      .repartition(col("_tbkt"))
      .write.mode("overwrite").partitionBy("_tbkt").parquet(path)
    LayoutMeta.overwrite(df.sparkSession, path, Map("buckets" -> buckets))
  }

  /** Append a batch's postings to an existing index — the incremental
    * crawl-ingest form; one new file per touched bucket. */
  def appendIndex(df: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = LayoutMeta.Unspecified): Unit = {
    val bk = LayoutMeta.resolve(df.sparkSession, path,
      Map("buckets" -> buckets), Map("buckets" -> 64))("buckets")
    postings(df, idCol, textCol)
      .withColumn("_tbkt", bucketCol(bk))
      .repartition(col("_tbkt"))
      .write.mode("append").partitionBy("_tbkt").parquet(path)
    LayoutMeta.commit(df.sparkSession, path, Map("buckets" -> bk))
  }

  /** The stored postings of exactly `tokens` — reads only the tokens'
    * bucket directories (partition-pruned). */
  def readPostings(spark: org.apache.spark.sql.SparkSession, path: String,
      tokens: Seq[String],
      buckets: Int = LayoutMeta.Unspecified): DataFrame = {
    val bk = LayoutMeta.resolve(spark, path,
      Map("buckets" -> buckets), Map("buckets" -> 64))("buckets")
    val toks = tokens.map(_.toLowerCase).distinct
    // bucket values computed driver-side with the same hash the write
    // used (xxhash64 over a 1-row literal frame — no corpus touched)
    val tbkts = toks.map { t =>
      spark.range(1)
        .select(pmod(xxhash64(lit(t)), lit(bk.toLong)).cast("int"))
        .head().getInt(0)
    }.distinct
    spark.read.parquet(path)
      .filter(col("_tbkt").isin(tbkts.map(Integer.valueOf): _*))
      .filter(col("token").isin(toks: _*))
      .select(col("doc"), col("pos"), col("token"))
  }

  /** [[phraseSearch]] served from the PERSISTED index: the pruned
    * bucket read feeds every join leg. */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
      path: String, phrase: Seq[String],
      buckets: Int = LayoutMeta.Unspecified): DataFrame =
    phraseSearch(readPostings(spark, path, phrase, buckets), phrase)

  /** Per-bucket posting counts — the reconciliation census: after any
    * build/append sequence, `sum(n_postings)` must equal the postings
    * count of the corpus the index claims to cover. */
  def censusByBucket(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.parquet(path).groupBy(col("_tbkt"))
      .agg(count(lit(1)).as("n_postings"))

  /** Docs containing `phrase` as CONSECUTIVE tokens, with the match
    * count per doc. Only the phrase tokens' postings are read. */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val toks = phrase.map(_.toLowerCase)
    // one pruned scan feeds every join leg
    val pruned = postings.filter(col("token").isin(toks: _*))
    val first = pruned.filter(col("token") === toks.head)
      .select(col("doc"), col("pos"))
    val matches = toks.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        val leg = pruned.filter(col("token") === t)
          .select(col("doc").as("_d"), (col("pos") - i).as("_p"))
        acc.join(leg, acc("doc") === col("_d") && acc("pos") === col("_p"))
          .select(acc("doc"), acc("pos"))
    }
    matches.groupBy(col("doc")).agg(count(lit(1)).as("n_matches"))
  }
}
