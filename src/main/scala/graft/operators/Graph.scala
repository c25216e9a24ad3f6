package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames (no GraphX dependency):
  * connected components via hash-min label propagation.
  *
  * Dedup at scale clusters verified duplicate PAIRS into groups and
  * keeps one representative per group (pairwise keep-first under-merges
  * chains: a~b, b~c but not a~c). Components give the transitive
  * closure.
  *
  * Algorithm: every node starts labeled with itself; each round every
  * node takes the min label among itself, its neighbors, AND its
  * current label's label (pointer jumping — reach doubles per round, so
  * rounds = O(log diameter) and a million-node path converges in ~20
  * rounds, not a million). Each round is three hash shuffles over the
  * edge/label lists — no quadratic blowup, works on billions of edges.
  * Lineage is truncated per round (localCheckpoint) — the standard
  * iterative-Spark pattern; swap for reliable checkpointing where
  * executor loss must not restart the job.
  */
object Graph {

  /** @param edges two integral columns (src, dst), undirected.
    * @param smallGraphLimit when the deduped directed edge list has at
    *        most this many rows, skip the iterative loop and union-find
    *        on the driver: each distributed round costs several fixed
    *        shuffle/checkpoint jobs, which dwarfs the actual work on
    *        small edge sets (a dedup pass over a mostly-unique corpus
    *        yields thousands of edges, not billions). The default
    *        (250k directed edges) costs the driver tens of MB of boxed
    *        tuples + hash-map entries — modest against any real driver
    *        heap, and graphs above it take the distributed path anyway.
    *        Pass 0 to force the distributed path (also skips the
    *        gating count job entirely). */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIterations: Int = 50,
      smallGraphLimit: Int = 250000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // pin the caller's edge pipeline BEFORE the symmetrize union: `e`
    // appears in both union branches, and Spark plans no ReusedExchange
    // across them — an unpinned (possibly expensive: dedup verification)
    // edge lineage would execute twice
    val e = edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst")).localCheckpoint(true)
    // undirected: keep both directions so one join propagates both ways
    val sym = e.unionByName(e.select(col("_dst").as("_src"), col("_src").as("_dst")))
      .distinct().localCheckpoint(true)

    if (smallGraphLimit > 0 && sym.count() <= smallGraphLimit)
      return driverComponents(sym)

    var labels = sym.select(col("_src").as("_node")).distinct()
      .withColumn("_comp", col("_node"))
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // min neighbor label per node (edge (src,dst): dst's label reaches src)
      val neighborMin = sym
        .join(labels.withColumnRenamed("_node", "_dst"), "_dst")
        .groupBy("_src").agg(min("_comp").as("_nmin"))
        .withColumnRenamed("_src", "_node")
      val merged = labels.withColumnRenamed("_comp", "_old")
        .join(neighborMin, Seq("_node"), "left")
        .select(col("_node"),
          least(col("_old"), coalesce(col("_nmin"), col("_old"))).as("_m"),
          col("_old"))
      // pointer jump: follow the label to ITS label (labels are node
      // ids, so every label has a row) — doubles reach per round
      val lookup = labels.select(col("_node").as("_c"), col("_comp").as("_cc"))
      // convergence probe FUSED into the step job: the accumulator
      // counts moved labels while the eager checkpoint materializes, so
      // each round is ONE job, not step-job + probe-job. Task retries /
      // speculation can only inflate the count, and the test is ==0, so
      // they can never fake convergence — at worst one extra
      // (idempotent) round runs.
      val changed = spark.sparkContext.longAccumulator("cc_changed")
      val step = merged
        .join(lookup.hint("shuffle_hash"), merged("_m") === col("_c"), "left")
        .select(col("_node"),
          least(col("_m"), coalesce(col("_cc"), col("_m"))).as("_comp"),
          col("_old"))
        .as[(Long, Long, Long)]
        .mapPartitions { it =>
          it.map { case r @ (_, comp, old) =>
            if (comp != old) changed.add(1L)
            r
          }
        }
        .toDF("_node", "_comp", "_old")
        .localCheckpoint(true)
      converged = changed.value == 0
      labels = step.select("_node", "_comp")
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIterations rounds")
    labels.select(col("_node").as("node"), col("_comp").as("component"))
  }

  /** Small-graph path: union-find with path compression on the driver.
    * Same output contract as the distributed loop (component = min
    * member id), deterministic regardless of edge order. */
  private def driverComponents(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) x = parent(x)
      // path compression
      var y = x0
      while (parent.getOrElse(y, y) != y) { val n = parent(y); parent(y) = x; y = n }
      x
    }
    sym.as[(Long, Long)].collect().foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val out = parent.keys.toArray.sorted.map(n => (n, find(n)))
    spark.createDataset(out.toIndexedSeq).toDF("node", "component")
  }
}
