package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge (pair) table — the clustering step
  * that turns near-duplicate PAIRS ([[Dedup]]/[[Similarity]] output) into
  * dedup GROUPS, so a pipeline can keep one canonical document per group
  * (reference analog: none — this is a north-star training-data op,
  * SURVEY §7.5).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node adopts the minimum label among
  * itself and its neighbors; at fixpoint each node carries its component's
  * minimum id. Rounds needed = the longest shortest-path to a component's
  * minimum (≤ diameter). Near-dup components are hub-shaped (a template
  * links its copies directly), so rounds stay single-digit at corpus scale.
  *
  * Scale shape: each round is ONE equi shuffle join (edges ⋈ labels on the
  * source id) plus ONE hash aggregate (min per node) — no driver-side graph
  * state, no quadratic step. Convergence is detected with a single scalar
  * action per round: the label-sum strictly decreases until fixpoint, so
  * equal consecutive sums ⇔ done. Labels are persisted per round and the
  * previous round unpersisted; a long-running production job would
  * `localCheckpoint` every few rounds to also truncate lineage.
  */
object Components {

  /** Component label for every node appearing in `pairs`.
    *
    * @param pairs    edge table; one row per undirected edge
    * @param aCol     left endpoint column (any integral type)
    * @param bCol     right endpoint column
    * @param maxIter  hard round cap (propagation distance bound); the loop
    *                 exits earlier at fixpoint
    * @return (node: long, label: long) — label = min node id reachable
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "d1",
      bCol: String = "d2", maxIter: Int = 20): DataFrame = {
    val edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long"), col(aCol).cast("long")))
      .distinct()
      .persist()

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .persist()
    var prevSum = checksum(labels)

    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val msgs = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      val next = labels.union(msgs)
        .groupBy("node").agg(min("label").as("label"))
        .persist()
      val s = checksum(next)
      labels.unpersist()
      labels = next
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    edges.unpersist()
    labels
  }

  /** Sum of labels — strictly decreasing under min-propagation until
    * fixpoint, so it doubles as the convergence check (one scalar action,
    * no row-level diff join).
    */
  private def checksum(labels: DataFrame): Long =
    labels.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
}
