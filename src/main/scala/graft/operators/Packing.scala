package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-batch preparation: assign each
  * item (document/chunk with a token count) to a fixed-budget context
  * window ("pack"), greedily and in a deterministic order.
  *
  * The reference pipeline stops at embedding upload
  * (/root/reference/streamlit_app.py:96-121); packing is the next step
  * a training-data pipeline needs once chunks exist — filling 2k/8k
  * token windows with minimal padding waste.
  *
  * Semantics (per shard, items visited in ascending `orderCol`):
  * the first item opens pack 0; each later item joins the current pack
  * when `fill + tok <= budget`, otherwise it opens the next pack. An
  * oversize item (tok > budget) occupies a pack alone. This greedy
  * next-fit rule is the standard streaming approximation of bin
  * packing: exact first-fit-decreasing would need random access to all
  * open packs, which does not distribute.
  *
  * Scale shape at 100 TB: packing is inherently sequential WITHIN an
  * ordered stream, so parallelism comes from sharding — the caller
  * picks a shard key (hash of doc id, language, source bucket...);
  * each shard is packed independently in one pass. The implementation
  * shuffles only (shard, key, tok) metadata rows — payloads stay where
  * they are and are re-joined by key afterward — and streams each
  * sorted partition with O(1) state, so a shard never has to fit in
  * memory and the shard count just needs to exceed the executor count.
  */
object Packing {

  /** Pack items into budget-sized windows. Returns (shardCol: int,
    * orderCol: long, tokenCol: int, pack: long) — one row per input
    * item with its assigned pack id, pack ids starting at 0 per shard.
    */
  def packGreedy(items: DataFrame, shardCol: String, orderCol: String,
      tokenCol: String, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = items.sparkSession
    import spark.implicits._
    // A null shard/order/token (failed cast, null text upstream) would
    // surface as a bare NullPointerException in the tuple encoder below;
    // fail with a message naming the column instead. raise_error stays
    // inside codegen — zero cost on the non-null path.
    def required(c: org.apache.spark.sql.Column, name: String) =
      when(c.isNull, raise_error(lit(
        s"packGreedy: null $name (check the $name column / its cast)")))
        .otherwise(c).as(name)
    val prepared = items
      .select(required(col(shardCol).cast("int"), shardCol),
        required(col(orderCol).cast("long"), orderCol),
        required(col(tokenCol).cast("int"), tokenCol))
      .as[(Int, Long, Int)]
      // one shard never straddles partitions; a partition may hold
      // several whole shards (hash collisions), handled by the
      // shard-change reset below
      .repartition(col(shardCol))
      .sortWithinPartitions(col(shardCol), col(orderCol))
    prepared.mapPartitions { it =>
      var shard = Int.MinValue
      var fill = 0L
      var pack = 0L
      var first = true
      it.map { case (s, k, t) =>
        if (first || s != shard) {
          shard = s; pack = 0L; fill = t.toLong; first = false
        } else if (fill + t > budget) {
          pack += 1L; fill = t.toLong
        } else fill += t
        (s, k, t, pack)
      }
    }.toDF(shardCol, orderCol, tokenCol, "pack")
  }
}
