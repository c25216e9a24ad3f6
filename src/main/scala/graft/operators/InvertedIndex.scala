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
