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
  * node takes the min label among itself and its neighbors; stop when a
  * round changes nothing. Rounds = graph diameter (duplicate clusters
  * are near-cliques/stars, so 2-4 rounds in practice). Each round is
  * two hash shuffles (join + min-agg) over the edge list — no
  * quadratic blowup, works on billions of edges. Lineage is truncated
  * per round (localCheckpoint) — the standard iterative-Spark pattern;
  * swap for reliable checkpointing where executor loss must not restart
  * the job.
  */
object Graph {

  /** @param edges two integral columns (src, dst), undirected.
    * @return (node, component) — component = min node id reachable. */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIterations: Int = 50): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("_src"),
      col(dstCol).cast("long").as("_dst"))
    // undirected: keep both directions so one join propagates both ways
    val sym = e.unionByName(e.select(col("_dst").as("_src"), col("_src").as("_dst")))
      .distinct().localCheckpoint(true)

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
      // one materialized frame carries old AND new labels, so the
      // convergence probe is a filter over cached blocks, not a re-join
      val step = labels.withColumnRenamed("_comp", "_old")
        .join(neighborMin, Seq("_node"), "left")
        .select(col("_node"),
          least(col("_old"), coalesce(col("_nmin"), col("_old"))).as("_comp"),
          col("_old"))
        .localCheckpoint(true)
      converged = step.filter(col("_comp") =!= col("_old")).limit(1).count() == 0
      labels = step.select("_node", "_comp")
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIterations rounds")
    labels.select(col("_node").as("node"), col("_comp").as("component"))
  }
}
