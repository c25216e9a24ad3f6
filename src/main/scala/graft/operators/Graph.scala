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

  /** Exact GLOBAL triangle count over an undirected edge list — the
    * second graph primitive duplicate-cluster analysis wants (a
    * near-clique's triangle density separates true duplicate families
    * from chains of borderline pairs that [[connectedComponents]] glues
    * together).
    *
    * Shape: degree ORIENTATION (Suri & Vassilvitskii, WWW'11 — "the
    * curse of the last reducer"). Each undirected edge orients from its
    * (degree, id)-smaller endpoint to the larger; every triangle then
    * has exactly one node with both out-edges, so counting wedge
    * closures counts each triangle ONCE. The payoff is skew-proof wedge
    * generation: out-degree under this orientation is O(sqrt(m)), so a
    * degree-d hub generates O(m) wedges total instead of d^2 — on a
    * co-occurrence graph where one boilerplate node touches millions,
    * d^2 is the difference between a job that finishes and one that
    * doesn't.
    *
    * Wedges outnumber edges by orders of magnitude (sum outdeg² vs m;
    * measured 41M wedges over 1.2M edges on the co-order gate graph),
    * so materializing them is the cost to avoid. When the oriented
    * adjacency fits an executor (`broadcastCloseLimit` edges, default
    * 20M ≈ a few hundred MB of packed longs) the per-pivot sorted
    * out-neighbor lists BROADCAST and each edge closes its triangles by
    * one merge-intersection — the wedge stream never exists as rows and
    * nothing shuffles after the adjacency agg. Above the limit, the
    * wedge self-join + shuffle closure join is the honest distributed
    * path (narrow (long, long) rows only). Self-loops drop, parallel
    * edges collapse (distinct), null-casting ids drop. Returns one row:
    * (n_edges = deduped undirected edges, n_triangles) —
    * integer-exact, so a SQL engine replays it verbatim. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String,
      broadcastCloseLimit: Long = 20000000L): DataFrame = {
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("_u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("_v"))
      .filter(col("_u").isNotNull && col("_v").isNotNull && col("_u") =!= col("_v"))
      .distinct()
      .localCheckpoint(true) // reused by degrees + orientation + closure
    val deg = canon.select(explode(array(col("_u"), col("_v"))).as("_n"))
      .groupBy("_n").agg(count(lit(1)).as("_d"))
    val withDeg = canon
      .join(deg.select(col("_n").as("_u"), col("_d").as("_du")), Seq("_u"))
      .join(deg.select(col("_n").as("_v"), col("_d").as("_dv")), Seq("_v"))
    val fwd = struct(col("_du"), col("_u")) < struct(col("_dv"), col("_v"))
    val oriented = withDeg.select(
        when(fwd, col("_u")).otherwise(col("_v")).as("_s"),
        when(fwd, col("_v")).otherwise(col("_u")).as("_t"),
        when(fwd, col("_dv")).otherwise(col("_du")).as("_dt"))
      .localCheckpoint(true) // both wedge sides + the closure probe
    val nEdges = canon.count() // needed for the output row anyway
    val nTriangles =
      if (nEdges <= broadcastCloseLimit) {
        // SMALL/MID regime: per-pivot out-neighbor lists broadcast (total
        // size O(m) longs), each edge (s,t) closes |N+(s) ∩ N+(t)|
        // triangles via one merge-intersection of two sorted arrays —
        // the 41M-row wedge stream is never materialized, no row ever
        // shuffles after the adjacency agg
        val adj = oriented.groupBy(col("_s"))
          .agg(sort_array(collect_list(col("_t"))).as("_nb"))
        val aS = broadcast(adj.select(col("_s"), col("_nb").as("_nbs")))
        val aT = broadcast(adj.select(col("_s").as("_t"), col("_nb").as("_nbt")))
        oriented.select(col("_s"), col("_t"))
          .join(aS, Seq("_s"), "inner")
          .join(aT, Seq("_t"), "inner")
          .select(size(array_intersect(col("_nbs"), col("_nbt"))).cast("long").as("_c"))
          .agg(coalesce(sum(col("_c")), lit(0L)).as("n_triangles"))
      } else {
        // LARGE regime: wedges at the pivot, emitted in orientation
        // order so the closing edge (if adjacent) is exactly the
        // oriented one; closure is a plain shuffle join — the honest
        // distributed path when the edge set cannot broadcast
        val wedges = oriented
          .select(col("_s"), col("_t").as("_b"), col("_dt").as("_db"))
          .join(oriented.select(col("_s"), col("_t").as("_c"), col("_dt").as("_dc")),
            Seq("_s"))
          .filter(struct(col("_db"), col("_b")) < struct(col("_dc"), col("_c")))
          .select(col("_b").as("_s"), col("_c").as("_t"))
        wedges.join(oriented.select(col("_s"), col("_t")), Seq("_s", "_t"))
          .agg(count(lit(1)).as("n_triangles"))
      }
    nTriangles.select(lit(nEdges).as("n_edges"), col("n_triangles"))
  }

  /** PageRank over a DIRECTED edge list — the third graph primitive a
    * corpus pipeline wants: rank-weighted sampling of crawl pages (a
    * page's rank is a quality prior the Gopher-style heuristics can't
    * see) and hub detection in near-dup clusters.
    *
    * EXACT FIXED-POINT arithmetic: ranks are longs in units of
    * `1/scale` and every step is integer multiply + floor division —
    * sums are order-independent and floor-div is deterministic, so two
    * engines replay the identical trajectory bit-for-bit (the SQL
    * oracle unrolls the same `iterations` rounds; a double-typed
    * PageRank could never hash-match across engines). The floor in
    * each contribution under-counts by < 1 unit per in-edge — at
    * scale=1e12 that is relative error < outdeg/1e12 per round, noise
    * against the 0.85 damping, and BOTH replicas floor identically.
    *
    * Per round: one join+agg shuffle (contributions keyed by dst) plus
    * a scalar aggregate for DANGLING mass (nodes with no out-edges
    * redistribute their rank uniformly, the standard correction —
    * computed as one bounded-driver scalar, never a row explosion).
    * Fixed `iterations` (no convergence probe): the caller picks the
    * horizon, the oracle replays it. Self-loops count as ordinary
    * edges; parallel edges collapse (distinct); null ids drop.
    *
    * @return (node LONG, rank LONG) — sum of ranks ≈ scale (minus
    *         cumulative floor loss), exact-integer reproducible. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 4, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1 && scale > 0 && dampNum > 0 && dampDen > dampNum)
    val e = edges
      .select(col(srcCol).cast("long").as("_s"), col(dstCol).cast("long").as("_t"))
      .filter(col("_s").isNotNull && col("_t").isNotNull)
      .distinct()
      .localCheckpoint(true) // reused every round + for nodes/outdeg
    val nodes = e.select(col("_s").as("_node"))
      .unionByName(e.select(col("_t").as("_node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val outdeg = e.groupBy("_s").agg(count(lit(1)).as("_d")).localCheckpoint(true)
    // dangling nodes are a STATIC set — resolve it once so the common
    // no-dangling graph pays zero per-round scalar jobs
    val danglingNodes = nodes
      .join(outdeg.withColumnRenamed("_s", "_node"), Seq("_node"), "left_anti")
      .localCheckpoint(true)
    val hasDangling = danglingNodes.head(1).nonEmpty
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var ranks = nodes.withColumn("_r", lit(scale / n)).localCheckpoint(true)
    for (iter <- 1 to iterations) {
      // dangling mass: rank held by nodes with no out-edges (one scalar
      // over the node-sized rank list; skipped entirely when none)
      val dangling =
        if (!hasDangling) 0L
        else ranks.join(danglingNodes, Seq("_node"), "left_semi")
          .agg(coalesce(sum(col("_r")), lit(0L))).head().getLong(0)
      val danglingShare = (dampNum * dangling) / (dampDen * n)
      // each out-edge of s carries the SAME contribution — compute it
      // once per node (node-sized relation, broadcastable), then one
      // join spreads it over the edge list and one agg collects by dst
      val perSrc = ranks
        .join(outdeg.withColumnRenamed("_s", "_node"), Seq("_node"))
        .select(col("_node").as("_s"),
          expr(s"(_r * $dampNum) div (_d * $dampDen)").as("_c"))
      val contribs = e.join(perSrc, Seq("_s"))
        .groupBy(col("_t").as("_node")).agg(sum(col("_c")).as("_in"))
      ranks = nodes
        .join(contribs, Seq("_node"), "left")
        .select(col("_node"),
          (lit(base + danglingShare) + coalesce(col("_in"), lit(0L))).as("_r"))
      // with dangling nodes each round CONSUMES ranks twice (scalar +
      // contributions) — checkpoint every round so the chain never
      // re-executes; a dangling-free graph has a LINEAR lineage, so a
      // sparser checkpoint (every 2nd round) only bounds plan depth and
      // halves the materialization jobs
      if (hasDangling || iter % 2 == 0 || iter == iterations)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("_node").as("node"), col("_r").as("rank"))
  }

  /** k-CORE peel over an undirected edge list — the graph-density
    * primitive duplicate-family and community analysis want (the k-core
    * is the maximal subgraph where every node keeps >= k neighbors;
    * boilerplate-driven near-dup clusters are high-core, chains of
    * borderline pairs are not).
    *
    * Iterative peel: each round drops every node whose degree WITHIN
    * the surviving subgraph is < k, until a fixpoint (or `maxRounds`).
    * Bounded-round semantics are EXACT and engine-replayable: "the
    * subgraph after R peel rounds" is deterministic whether or not the
    * fixpoint was reached, so a SQL oracle unrolls the same R rounds
    * and hash-matches; when the peel converges within R (the returned
    * `converged` tells the caller), the result IS the true k-core.
    *
    * Per round: the edge list (narrow longs, checkpointed once) joins
    * the surviving-node set on both endpoints and aggregates degrees —
    * two hash joins + one partial agg, nothing edge-quadratic; rounds
    * needed in practice are small (peeling cascades are shallow on
    * heavy graphs — measured 5 at the gate's k). Self-loops drop,
    * parallel/reversed edges collapse.
    *
    * @return ((node LONG, core_deg LONG) DataFrame — degrees
    *         recomputed within the final subgraph — , converged). */
  /** Synchronous LABEL PROPAGATION communities (LPA, Raghavan et al.
    * 2007) with EXACT bounded-round semantics — the fourth member of
    * the bounded-round family ([[pageRank]]'s fixed iterations,
    * [[kCore]]'s bounded peel): labels start as node ids; each round
    * every node adopts the most frequent label among its neighbors,
    * ties broken by SMALLEST label — fully deterministic, so the
    * R-round state is engine-replayable and the DuckDB oracle unrolls
    * the same rounds (an async/randomized LPA never could).
    *
    * Near-duplicate clusters from [[connectedComponents]] treat any
    * bridge as membership; LPA is the density-sensitive alternative —
    * a thin bridge between two dense near-dup communities does NOT
    * merge them, because the bridge node's neighbors vote it into one
    * side.
    *
    * Per round: ONE join (labels onto the symmetrized edge list, the
    * labels side broadcast while it fits — node-sized, like kCore's
    * alive set) + one (node, label) count + one per-node window min —
    * the Pregel-equivalent floor; lineage checkpoints every 2nd
    * round. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("_u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("_v"))
      .filter(col("_u").isNotNull && col("_v").isNotNull && col("_u") =!= col("_v"))
      .distinct()
    val sym = canon
      .unionByName(canon.select(col("_v").as("_u"), col("_u").as("_v")))
      .localCheckpoint(true)
    val nNodes = sym.select(col("_u")).distinct().count()
    val broadcastLimit = 1000000L
    def labelSide(df: DataFrame) =
      if (nNodes <= broadcastLimit) broadcast(df) else df
    var labels = sym.select(col("_u").as("_node"))
      .distinct().withColumn("_label", col("_node"))
      .localCheckpoint(true)
    (1 to rounds).foreach { r =>
      val votes = sym
        .join(labelSide(labels.select(col("_node").as("_u"), col("_label"))),
          "_u")
        .groupBy(col("_v").as("_node"), col("_label"))
        .agg(count(lit(1)).as("_c"))
      // (c desc, label asc) as a max_by over (c, -label): the ordering
      // key is UNIQUE per (node, label) so max_by is deterministic, and
      // unlike a row_number window it partial-aggregates map-side with
      // no per-round sort (measured 5.0 -> faster at sf0.1); labels are
      // non-negative ids (the engine contract), so -label cannot
      // overflow
      val next = votes
        .groupBy(col("_node"))
        .agg(max_by(col("_label"), struct(col("_c"), -col("_label")))
          .as("_label"))
      labels =
        if (r % 2 == 0 || r == rounds) next.localCheckpoint(true)
        else next
    }
    labels.select(col("_node").as("node"), col("_label").as("label"))
  }

  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 50): (DataFrame, Boolean) = {
    require(k >= 1 && maxRounds >= 1)
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("_u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("_v"))
      .filter(col("_u").isNotNull && col("_v").isNotNull && col("_u") =!= col("_v"))
      .distinct()
    val sym = canon
      .unionByName(canon.select(col("_v").as("_u"), col("_u").as("_v")))
      .localCheckpoint(true) // probed twice per round, every round
    var alive = sym.select(col("_u").as("_node")).distinct().localCheckpoint(true)
    var nAlive = alive.count()
    // a checkpointed node set reports the DEFAULT size estimate, so the
    // planner would never auto-broadcast it — but nAlive is known
    // exactly, and while it fits an executor the semi joins should be
    // broadcasts (the edge list then never shuffles inside a round,
    // only the per-node degree agg does)
    val broadcastLimit = 1000000L
    def aliveSide(renameTo: String) = {
      val a = alive.withColumnRenamed("_node", renameTo)
      if (nAlive <= broadcastLimit) broadcast(a) else a
    }
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = sym
        .join(aliveSide("_u"), Seq("_u"), "left_semi")
        .join(aliveSide("_v"), Seq("_v"), "left_semi")
        .groupBy(col("_u").as("_node")).agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= k)
        .select(col("_node"))
        .localCheckpoint(true)
      val nNext = next.count()
      converged = nNext == nAlive
      alive = next
      nAlive = nNext
      round += 1
      if (nAlive == 0) converged = true // empty set is trivially stable
    }
    // final degrees recomputed WITHIN the surviving subgraph (matches
    // what an R-round oracle replay states)
    val out = sym
      .join(aliveSide("_u"), Seq("_u"), "left_semi")
      .join(aliveSide("_v"), Seq("_v"), "left_semi")
      .groupBy(col("_u").as("node")).agg(count(lit(1)).as("core_deg"))
    (out, converged)
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

  /** INCREMENTAL connected components — fold a batch of NEW edges into
    * an existing (node, component) labeling without re-running CC over
    * the historical edge set. The near-dup graph of a growing corpus
    * is the motivating case: each ingest batch adds thousands of
    * verified-duplicate edges to a graph whose full edge history is
    * corpus-sized and should never be re-read.
    *
    * Mechanics (component CONTRACTION): each new edge's endpoints map
    * to their current component labels (an unseen endpoint labels
    * itself — unseen ids can never collide with a label, because
    * labels are existing node ids); [[connectedComponents]] runs on
    * that CONTRACTED graph, whose size is bounded by the BATCH, not
    * the corpus; the resulting label→label remap (batch-bounded, so it
    * broadcasts) joins onto the stored labeling. Labels stay the
    * global min node id, because contracting preserves min-label
    * reachability: the contracted nodes ARE the old minima.
    *
    * Contract (spec + q194-gated): given `labels == CC(E_old)`,
    * `mergeComponents(labels, E_new) == CC(E_old ∪ E_new)` row for
    * row. Cost: O(batch CC) + one broadcast-joined pass over the
    * labeling — at 100 TB the labeling pass rewrites only the
    * key-hash buckets holding remapped components if the labeling is
    * stored bucketed ([[Scd]] layout). */
  def mergeComponents(labels: DataFrame, newEdges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    // the labeling is consumed three times (endpoint slice, remap,
    // new-node anti join) but NOT pinned — it is corpus-sized, and
    // re-scanning a column-pruned parquet labeling is cheaper than
    // holding it in the block manager; only batch-bounded frames
    // checkpoint here
    val lab = labels.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("component"))
    val e = newEdges.select(col(srcCol).cast("long").as("_s"),
      col(dstCol).cast("long").as("_d")).localCheckpoint(true)
    // the labeling is corpus-sized — semi-join it down to the batch's
    // endpoints FIRST (endpoints broadcast; the labeling scan is one
    // column-pruned pass, no shuffle), and only that batch-bounded
    // slice broadcasts into the per-edge label join
    val endpoints = e.select(col("_s").as("node"))
      .unionByName(e.select(col("_d").as("node"))).distinct()
    val labSub = lab.join(broadcast(endpoints), Seq("node"), "left_semi")
      .localCheckpoint(true)
    def toLabel(side: String) = {
      val m = labSub.select(col("node").as(side), col("component").as(s"_c$side"))
      (df: DataFrame) => df.join(broadcast(m), Seq(side), "left")
        .withColumn(s"_l$side", coalesce(col(s"_c$side"), col(side)))
        .drop(s"_c$side")
    }
    val contracted = toLabel("_d")(toLabel("_s")(e))
      .select(col("_l_s").as("_cs"), col("_l_d").as("_cd"))
    val cc = connectedComponents(contracted, "_cs", "_cd")
      .select(col("node").as("_from"), col("component").as("_to"))
      .localCheckpoint(true) // batch-bounded remap, consumed twice
    // remap stored labels whose component merged (broadcast: the map
    // is bounded by the batch's endpoints)
    val remapped = lab
      .join(broadcast(cc.withColumnRenamed("_from", "component")),
        Seq("component"), "left")
      .select(col("node"), coalesce(col("_to"), col("component")).as("component"))
    // genuinely-new nodes: contracted nodes that are not existing ids
    val newNodes = cc
      .join(lab.select(col("node").as("_from")), Seq("_from"), "left_anti")
      .select(col("_from").as("node"), col("_to").as("component"))
    remapped.unionByName(newNodes)
  }
}
