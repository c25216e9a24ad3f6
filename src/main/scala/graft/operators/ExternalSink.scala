package graft.operators

import graft.core.VectorRecord
import org.apache.spark.sql.{DataFrame, Row}

/** Batched external-sink writer with retry/backoff (SURVEY.md §2.D
  * D3/D5/D6).
  *
  * Reproduces the reference's upsert loop semantics
  * (`/root/reference/streamlit_app.py:97-121`): slice the payload into
  * batches of `batchSize` (=100), retry each failed batch up to
  * `maxRetries` attempts with exponential backoff `delaySec * 2^attempt`
  * between attempts — 2/4 s for the defaults; like the reference, no
  * sleep follows the final attempt — and accumulate the per-batch
  * upserted counts. The
  * reference silently DROPS a batch after max retries (`:120-121`);
  * our default fails the job instead — dropping is opt-in via
  * `dropFailedBatches=true` for strict reference parity.
  *
  * Runs as `foreachPartition` — batches are per-partition, so 1000
  * executors push 1000 concurrent upsert streams; counts come back
  * through a LongAccumulator (no driver collect).
  */
object ExternalSink {

  /** Client boundary standing in for the vector-DB data plane
    * (`index.upsert`, streamlit_app.py:110). Returns upserted_count. */
  trait UpsertClient extends Serializable {
    def upsert(batch: Seq[VectorRecord]): Int
  }

  final case class Result(upserted: Long, droppedBatches: Long)

  def write(
      records: DataFrame,
      client: UpsertClient,
      batchSize: Int = 100,
      maxRetries: Int = 3,
      delaySec: Int = 2,
      dropFailedBatches: Boolean = false,
      sleeper: Long => Unit = ms => Thread.sleep(ms)): Result = {
    val sc = records.sparkSession.sparkContext
    val upserted = sc.longAccumulator("graft.upserted")
    val dropped = sc.longAccumulator("graft.droppedBatches")

    records.select("id", "values", "metadata").foreachPartition { it: Iterator[Row] =>
      it.grouped(batchSize).foreach { rows =>
        val batch = rows.map { r =>
          VectorRecord(
            r.getString(0),
            r.getSeq[Float](1).toArray,
            rowToMeta(r))
        }
        var attempt = 0
        var done = false
        while (!done) {
          try {
            upserted.add(client.upsert(batch).toLong)
            done = true
          } catch {
            case e: Exception =>
              attempt += 1
              if (attempt >= maxRetries) {
                if (dropFailedBatches) { dropped.add(1); done = true } // ref :120-121
                else throw new RuntimeException(
                  s"upsert batch failed after $maxRetries attempts", e)
              } else {
                // 2s/4s/8s for delaySec=2, matching ref :115 (2*2^attempt)
                sleeper(delaySec * 1000L * (1L << (attempt - 1)))
              }
          }
        }
      }
    }
    Result(upserted.value, dropped.value)
  }

  private def rowToMeta(r: Row): Map[String, String] = r.get(2) match {
    case null => Map.empty
    case m: Map[_, _] => m.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
    case s: Row => s.schema.fieldNames.zipWithIndex.map { case (f, i) =>
      f -> String.valueOf(s.get(i))
    }.toMap
  }
}
