package graft.ops

import org.apache.spark.sql.DataFrame
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
    * least `minSupport` distinct orders.
    */
  def coPurchaseEdges(li: DataFrame, minSupport: Int): DataFrame = {
    val p = li.select("l_orderkey", "l_partkey")
    p.join(p.withColumnRenamed("l_partkey", "p2"), Seq("l_orderkey"))
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

  /** PageRank over the symmetrization of an oriented edge list, `iters`
    * fixed BSP iterations at damping `d`. The symmetrized graph has no
    * dangling nodes (every node has degree >= 1), so no dangling-mass
    * term is needed and total rank mass stays exactly 1 per iteration.
    * Returns (node, pr) unrounded — callers round at the output edge.
    *
    * Lineage discipline: rounds chain LAZILY and truncate (eager
    * `localCheckpoint`) only every `checkpointEvery` rounds — the
    * unbounded-growth failure mode ([[Components]]' round-2 lesson) needs
    * truncation, but truncating EVERY round pays one materialization job
    * per iteration, which is the dominant cost of a short fixed-iteration
    * run (the whole 3-round q33 floor was ~4 of these jobs). A bounded
    * unroll of ≤ `checkpointEvery` joins keeps the optimizer's work O(1)
    * in total iterations while folding several rounds into each scheduled
    * job. Edges are persisted pre-partitioned on the join key so every
    * round reuses one side's partitioning.
    */
  def pagerank(e0: DataFrame, iters: Int, d: Double,
      checkpointEvery: Int = 4): DataFrame = {
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val deg = edges.groupBy("u").agg(count(lit(1)).cast("double").as("d"))
    val withDeg = edges.join(deg, "u").repartition(col("u")).persist()
    val n = withDeg.select(countDistinct(col("u"))).head().getLong(0).toDouble
    // Initial ranks come off the PERSISTED edge list (not the raw deg
    // subtree, which would recompute the whole upstream graph build).
    var ranks = withDeg.select(col("u").as("node")).distinct()
      .select(col("node"), lit(1.0 / n).as("pr"))
    var sinceTruncate = 0
    for (i <- 1 to iters) {
      ranks = pagerankRound(ranks, withDeg, n, d)
      sinceTruncate += 1
      if (sinceTruncate >= checkpointEvery && i < iters) {
        ranks = ranks.localCheckpoint(true)
        sinceTruncate = 0
      }
    }
    ranks
  }

  /** One BSP PageRank round — the recurring unit of [[pagerank]]: scatter
    * rank/degree along out-edges, gather by destination, apply damping.
    * One shuffle (the gather aggregate); the edges side is persisted by the
    * caller so each round pays exactly this plan. Audited as `q33_round` in
    * `PlanAudit` (whole-query fingerprints of iterative operators count the
    * printed cached-subtree references, not the recurring execution cost).
    */
  def pagerankRound(ranks: DataFrame, withDeg: DataFrame, n: Double,
      d: Double): DataFrame =
    ranks
      .join(withDeg, ranks("node") === withDeg("u"))
      .select(col("v").as("node"), (col("pr") / col("d")).as("c"))
      .groupBy("node")
      .agg(sum("c").as("m"))
      .select(col("node"), (lit((1.0 - d) / n) + lit(d) * col("m")).as("pr"))
}
