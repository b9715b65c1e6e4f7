package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over item co-occurrence (reference analog: none — this
  * is north-star territory; the graph is the co-purchase relation the
  * dedup-cluster machinery in [[Components]] doesn't cover).
  *
  * Scale shape: `coPurchaseEdges` prunes FIRST (support >= minSupport
  * collapses a near-complete co-occurrence graph orders of magnitude
  * before any quadratic step); `triangleStats` roots every wedge at its
  * smallest endpoint so each triangle is counted exactly once; `pagerank`
  * is the canonical BSP join-reaggregate with a FIXED iteration count, so
  * lineage stays bounded without checkpointing (the unbounded-iteration
  * pattern with lineage truncation lives in [[Components]]). The only
  * driver-side value anywhere is pagerank's node count — one scalar.
  */
object Graphs {

  /** Undirected support-pruned co-purchase edges (u < v) from a lineitem
    * projection (`l_orderkey`, `l_partkey`): parts co-occurring in at
    * least `minSupport` orders (line-pair multiplicity).
    *
    * Deliberately a plain self-join + aggregate, NOT a
    * collect_list-per-basket + higher-order-function pair explosion: the
    * basket spelling measures ~20% faster at sf0.1 (join overhead
    * dominates small inputs) but 2.4× SLOWER at 30× replication, because
    * Spark's higher-order functions are CodegenFallback — every exploded
    * pair walks the interpreted expression path, while the self-join +
    * hash aggregate stays inside whole-stage codegen end to end. The
    * small-scale win is an artifact; the codegen'd join is what survives
    * 100×.
    */
  def coPurchaseEdges(li: DataFrame, minSupport: Int): DataFrame = {
    val p = li.select("l_orderkey", "l_partkey")
    // shuffle_hash: equal-size self-join sides, so SMJ's two full sorts
    // buy nothing — hashing one side skips both (order keys are uniform;
    // a skewed build side would flip this back to SMJ via AQE).
    p.join(p.withColumnRenamed("l_partkey", "p2").hint("shuffle_hash"),
        Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
      .select(col("l_partkey").as("u"), col("p2").as("v"))
  }

  /** One row: n_edges, n_wedges, n_triangles for an oriented (u < v) edge
    * list. Wedges are rooted at the smallest endpoint, so the closing join
    * touches each triangle exactly once — and it is a LEFT join whose
    * match marker distinguishes closed from open wedges, so the wedge set
    * is generated and traversed ONCE for both counts (the two-aggregate
    * spelling would re-run the wedge join per aggregate).
    */
  def triangleStats(e: DataFrame): DataFrame = {
    val wedges = e.join(e.select(col("u"), col("v").as("c")), Seq("u"))
      .filter(col("v") < col("c"))
    val marked = wedges.join(
      e.select(col("u").as("v"), col("v").as("c"), lit(1).as("closed")),
      Seq("v", "c"), "left")
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(marked.agg(
        count(lit(1)).as("n_wedges"),
        count(col("closed")).as("n_triangles")))
  }

  /** PageRank over the symmetrization of an oriented edge list — convenience
    * wrapper over [[pagerankSymmetric]] for callers holding u < v edges.
    * The reversed branch duplicates the edge-build subtree in the logical
    * plan; its shuffle is deduped at runtime by exchange reuse.
    */
  def pagerank(e0: DataFrame, iters: Int, d: Double,
      checkpointEvery: Int = 4): DataFrame =
    pagerankSymmetric(
      e0.union(e0.select(col("v").as("u"), col("u").as("v"))),
      iters, d, checkpointEvery)

  /** PageRank over an already-symmetric edge list, `iters` fixed BSP
    * iterations at damping `d`. A symmetric graph has no dangling nodes
    * (every node has degree >= 1), so no dangling-mass term is needed and
    * total rank mass stays exactly 1 per iteration. Returns (node, pr)
    * unrounded — callers round at the output edge.
    *
    * Runs in SCALED form: the iterate carried between rounds is
    * P = pr·n (n = node count), whose recurrence
    * `P' = (1-d) + d·Σ P_u/deg_u` needs no n at all — so the node count
    * never has to be computed eagerly on the driver, the initial rank is
    * the constant 1.0, and the whole multi-round computation stays ONE lazy
    * plan executed by a single action (the round-4 spelling spent a
    * measurable slice of its wall-clock on the up-front `count(distinct)`
    * job that only existed to seed 1/n). The division by n happens once at
    * the output edge, against a broadcast single-row aggregate.
    *
    * Exchange discipline: degrees are attached with a whole-partition
    * window over `u` rather than a groupBy+join — one exchange to
    * hashpartitioning(u) that simultaneously IS the persisted layout every
    * round's join reuses (the window's partition-local sort also leaves the
    * cache sorted on u, so the round join needs neither exchange nor sort
    * on the edges side). Rank rounds chain LAZILY and truncate (eager
    * `localCheckpoint`) only every `checkpointEvery` rounds — the
    * unbounded-growth failure mode ([[Components]]' round-2 lesson) needs
    * truncation, but truncating EVERY round pays one materialization job
    * per iteration, which is the dominant cost of a short fixed-iteration
    * run. A bounded unroll of ≤ `checkpointEvery` joins keeps the
    * optimizer's work O(1) in total iterations while folding several
    * rounds into each scheduled job; superseded checkpoints are unpersisted
    * as soon as their successor materializes, so long runs hold at most one
    * checkpointed rank table in storage memory.
    */
  def pagerankSymmetric(edges: DataFrame, iters: Int, d: Double,
      checkpointEvery: Int = 4): DataFrame = {
    // persist() is lazy: the cache materializes inside the first round's
    // job, not as a separate up-front action.
    val withDeg = edges.withColumn("d",
      count(lit(1)).over(Window.partitionBy("u")).cast("double")).persist()
    // Scaled initial rank: P0 = 1.0 for every node. The distinct reuses the
    // cache's hashpartitioning(u) — no exchange.
    var ranks = withDeg.select(col("u").as("node")).distinct()
      .select(col("node"), lit(1.0).as("pr"))
    var lastCheckpoint: DataFrame = null
    var sinceTruncate = 0
    for (i <- 1 to iters) {
      ranks = pagerankRound(ranks, withDeg, d)
      sinceTruncate += 1
      if (sinceTruncate >= checkpointEvery && i < iters) {
        // localCheckpoint(eager = true) returns only after the new round's
        // blocks exist, so dropping the superseded checkpoint here is safe.
        val cp = ranks.localCheckpoint(true)
        if (lastCheckpoint != null) lastCheckpoint.unpersist(false)
        lastCheckpoint = cp
        ranks = cp
        sinceTruncate = 0
      }
    }
    // Unscale: pr = P/n. n is a single-row aggregate off the cached edges,
    // attached by broadcast — no extra shuffle, no driver action.
    val nn = broadcast(
      withDeg.select(countDistinct(col("u")).cast("double").as("n")))
    ranks.crossJoin(nn).select(col("node"), (col("pr") / col("n")).as("pr"))
  }

  /** One BSP PageRank round in scaled form — the recurring unit of
    * [[pagerankSymmetric]]: scatter P/degree along out-edges, gather by
    * destination, apply damping (`P' = (1-d) + d·m`). One shuffle (the
    * gather aggregate); the edges side is persisted by the caller so each
    * round pays exactly this plan. Audited as `q33_round` in `PlanAudit`
    * (whole-query fingerprints of iterative operators count the printed
    * cached-subtree references, not the recurring execution cost).
    */
  def pagerankRound(ranks: DataFrame, withDeg: DataFrame,
      d: Double): DataFrame =
    ranks
      .join(withDeg, ranks("node") === withDeg("u"))
      .select(col("v").as("node"), (col("pr") / col("d")).as("c"))
      .groupBy("node")
      .agg(sum("c").as("m"))
      .select(col("node"), (lit(1.0 - d) + lit(d) * col("m")).as("pr"))
}
