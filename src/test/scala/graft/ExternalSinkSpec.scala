package graft

import graft.core.VectorRecord
import graft.operators.ExternalSink
import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

/** In-JVM mock sink shared across local executor threads (top-level so
  * the task closure stays serializable). */
object MockStore {
  val map = new ConcurrentHashMap[String, VectorRecord]()
  val calls = new AtomicInteger(0)
  val failuresLeft = new AtomicInteger(0)
  @volatile var sleeps: List[Long] = Nil
  def reset(failures: Int = 0): Unit = {
    map.clear(); calls.set(0); failuresLeft.set(failures); sleeps = Nil
  }
}

class MockClient extends ExternalSink.UpsertClient {
  override def upsert(batch: Seq[VectorRecord]): Int = {
    MockStore.calls.incrementAndGet()
    if (MockStore.failuresLeft.getAndDecrement() > 0)
      throw new RuntimeException("injected transient failure")
    batch.foreach(r => MockStore.map.put(r.id, r))
    batch.size
  }
}

object RecordSleeper extends Serializable {
  def apply(ms: Long): Unit = MockStore.synchronized { MockStore.sleeps ::= ms }
}

/** Reference upsert-loop semantics (streamlit_app.py:97-121): batches of
  * 100, 3 retries with exponential backoff 2/4/8s, drop-or-fail after. */
class ExternalSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def records(n: Int) = {
    spark.createDataFrame((0 until n).map(i =>
      (s"doc-$i", Seq(i.toFloat, 1f), Map("chunk_index" -> i.toString))))
      .toDF("id", "values", "metadata")
      .repartition(1) // deterministic batch slicing for call-count asserts
  }

  test("batches of 100, counts accumulated (D3/D6)") {
    MockStore.reset()
    val res = ExternalSink.write(records(250), new MockClient,
      batchSize = 100, sleeper = RecordSleeper.apply)
    assert(res.upserted == 250 && res.droppedBatches == 0)
    assert(MockStore.calls.get() == 3) // 100+100+50
    assert(MockStore.map.size() == 250)
  }

  test("transient failures are retried with backoff 2s,4s (D5)") {
    MockStore.reset(failures = 2)
    val res = ExternalSink.write(records(50), new MockClient, batchSize = 100,
      maxRetries = 3, delaySec = 2, sleeper = RecordSleeper.apply)
    assert(res.upserted == 50)
    assert(MockStore.sleeps.reverse == List(2000L, 4000L)) // 2*2^0, 2*2^1 sec
  }

  test("default: job fails after max retries") {
    MockStore.reset(failures = 100)
    intercept[Exception] {
      ExternalSink.write(records(50), new MockClient,
        maxRetries = 3, sleeper = RecordSleeper.apply)
    }
  }

  test("reference drop-mode: batch dropped, pipeline continues (ref :120-121)") {
    MockStore.reset(failures = 3) // first batch exhausts its 3 attempts
    val res = ExternalSink.write(records(150), new MockClient, batchSize = 100,
      maxRetries = 3, dropFailedBatches = true, sleeper = RecordSleeper.apply)
    assert(res.droppedBatches == 1)
    assert(res.upserted == 50) // second batch lands
  }
}
