package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge (pair) table — the clustering step
  * that turns near-duplicate PAIRS ([[Dedup]]/[[Similarity]] output) into
  * dedup GROUPS, so a pipeline can keep one canonical document per group
  * (reference analog: none — this is a north-star training-data op,
  * SURVEY §7.5).
  *
  * Algorithm: iterative min-label propagation with pointer jumping. Every
  * node starts labeled with its own id; each round every node adopts the
  * minimum label among itself and its neighbors, then compresses one
  * pointer hop (`label(v) := label(label(v))`) so the component minimum
  * travels exponentially — O(log diameter) rounds on path-shaped graphs
  * instead of O(diameter), and still 1-2 rounds on the hub-shaped graphs
  * near-dup pairs actually produce.
  *
  * Scale shape: each round is one equi shuffle join (edges ⋈ labels) plus
  * one hash aggregate (min per node) plus one label⋈label compression join
  * — no driver-side graph state, no quadratic step. Critically the round
  * output is `localCheckpoint(eager = true)`-ed: the logical plan entering
  * round k+1 is a flat scan of round k's materialized RDD, so analyzer /
  * optimizer cost per round is CONSTANT in k. (Without truncation the plan
  * references `labels` twice per round and doubles every iteration — at 11
  * rounds even 12 rows take minutes of driver-side planning.) Checkpointed
  * label RDDs are small (two longs per node) and bounded by the O(log d)
  * round count; superseded checkpoint blocks are released by Spark's
  * ContextCleaner once each round drops its predecessor reference.
  *
  * Convergence is detected with a single scalar action per TWO rounds: the
  * label-sum strictly decreases until fixpoint, so equal sums two rounds
  * apart ⇔ done (and rounds past the fixpoint are identity, so the result
  * is unchanged by the batching). Both rounds' checkpoints are marked LAZY
  * and the checksum action is what materializes them — one Spark job per
  * two rounds (r14; the round-7 JobProf audit measured the original eager
  * shape at 2 jobs/round, half pure scheduling floor, and the r14 audit
  * halved the remaining action count again; the label blocks the checksum
  * leaves behind are identical either way, so the next round still plans
  * against a flat materialized scan).
  */
object Components {

  /** Component label for every node appearing in `pairs`.
    *
    * @param pairs    edge table; one row per undirected edge
    * @param aCol     left endpoint column (any integral type)
    * @param bCol     right endpoint column
    * @param maxIter  hard round cap (now a log-diameter bound thanks to
    *                 pointer jumping); the loop exits earlier at fixpoint
    * @return (node: long, label: long) — label = min node id reachable
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "d1",
      bCol: String = "d2", maxIter: Int = 20): DataFrame = {
    // Lazy checkpoint marks throughout: each round's checksum action is
    // the materializer, so the loop costs ONE job per round (plus one for
    // the initial labels; edges materialize inside round 1's job).
    val edges = pairs
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long"), col(aCol).cast("long")))
      .distinct()
      .localCheckpoint(false)

    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(false)

    // TWO propagation rounds per action (r14 optimization): both rounds'
    // checkpoints are lazy, so the checksum job materializes round k (its
    // blocks feed round k+1 inside the same job) and then round k+1 — one
    // job per two rounds instead of one per round, halving the scheduling
    // floor AND the materialization barriers at scale. The label sum
    // strictly decreases every non-fixpoint round, so equal sums two
    // rounds apart still detect the fixpoint exactly; extra rounds past
    // the fixpoint are identity (min-propagation is monotone), so the
    // returned labels are identical to the round-at-a-time loop's. The
    // initial checksum is gone too (prevSum starts empty — the first
    // comparison can only fire after one measured sum); initial labels
    // materialize inside the first loop job, like edges always did.
    var prevSum: Option[Long] = None
    var rounds = 0
    var converged = false
    while (rounds < maxIter && !converged) {
      val mid = propagationRound(edges, labels).localCheckpoint(false)
      // Respect maxIter as a HARD round cap: the second round of a batch
      // only runs while it stays under the cap (an odd cap's last batch is
      // a single round). Sum equality at EITHER gap (one or two rounds)
      // implies fixpoint — the label sum strictly decreases every
      // non-fixpoint round.
      val next =
        if (rounds + 1 < maxIter) {
          rounds += 2
          propagationRound(edges, mid).localCheckpoint(false)
        } else {
          rounds += 1
          mid
        }
      val s = checksum(next)
      labels = next
      converged = prevSum.contains(s)
      prevSum = Some(s)
    }
    labels
  }

  /** One min-label-propagation round: every node adopts the minimum label
    * among itself and its neighbors, then chases one pointer hop through the
    * previous round's labels. Exposed separately so [[graft.PlanAudit]] can
    * fingerprint the round plan — both its inputs are materialized
    * checkpoints inside the loop, so THIS is the entire recurring plan and
    * its shape is constant in the round number: one equi shuffle join, one
    * hash aggregate, one compression join.
    */
  def propagationRound(edges: DataFrame, labels: DataFrame): DataFrame = {
    val msgs = edges
      .join(labels.withColumnRenamed("node", "src"), "src")
      .select(col("dst").as("node"), col("label"))
    val stepped = labels.union(msgs)
      .groupBy("node").agg(min("label").as("label"))
    // Pointer jumping: chase one extra hop through the PREVIOUS round's
    // labels (already materialized, so no self-join recompute and no
    // second checkpoint per round). `label` values are always node ids
    // of the same component, so the lookup stays within labels' key
    // space; the left join + coalesce only guards the (impossible) miss.
    stepped
      .join(
        labels.select(col("node").as("label"), col("label").as("hop")),
        Seq("label"), "left")
      .select(col("node"), coalesce(col("hop"), col("label")).as("label"))
  }

  /** Sum of labels — strictly decreasing under min-propagation until
    * fixpoint, so it doubles as the convergence check (one scalar action,
    * no row-level diff join).
    */
  private def checksum(labels: DataFrame): Long =
    labels.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)
}
