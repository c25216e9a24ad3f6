package graft.operators

/** Driver-side bounded parallelism for scatter-gather serving (r20).
  *
  * A scatter phase's per-shard work is driver manifest/footer reads
  * plus EAGER Spark actions (localCheckpoint, count) — run in a plain
  * `map` those serialize and the phase's wall latency is Σ(shards),
  * which at 100 shards IS the serving latency. Spark's scheduler
  * accepts jobs from any thread, so submitting the shards' work
  * concurrently overlaps both the driver-side metadata reads and the
  * cluster jobs: the phase costs max(shard) instead.
  *
  * Pool size caps at 8: each unit of work is already a multi-task
  * Spark job, so more concurrent submitters than that just contend on
  * the scheduler. The pool is created per call and always shut down —
  * worker threads inherit the caller's inheritable thread locals
  * (Spark local properties: job group, streaming query id) at
  * creation, so job attribution survives. Exceptions propagate to the
  * caller (Await rethrows the first failure); single-item lists skip
  * the pool entirely. Results keep `items` order. */
private[graft] object Par {
  def inParallel[A, B](items: Seq[A])(f: A => B): Seq[B] =
    if (items.size <= 1) items.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(items.size, 8))
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutor(pool)
        scala.concurrent.Await.result(
          scala.concurrent.Future.traverse(items)(a =>
            scala.concurrent.Future(f(a))),
          scala.concurrent.duration.Duration.Inf)
      } finally pool.shutdown()
    }
}
