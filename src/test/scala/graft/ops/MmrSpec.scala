package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Mmr]] greedy re-ranking: verified against an independent in-test
  * reference implementation (plain Scala, different data structures), plus
  * the contract edges the oracle can't exercise — negative similarities,
  * k > candidate count, tie-breaks.
  */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  /** Independent greedy MMR: recompute from (rel, sim) maps with a fold —
    * no shared code with [[Mmr.rerank]].
    */
  private def reference(
      rel: Map[Long, Double],
      sim: Map[(Long, Long), Double],
      k: Int): Seq[(Int, Long, Double)] = {
    val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Double)]()
    var selected = List.empty[Long]
    for (step <- 1 to math.min(k, rel.size)) {
      val scoredCands = rel.keys.toSeq.filterNot(selected.contains).map { c =>
        val mx =
          if (selected.isEmpty) 0.0
          else selected.map(s => sim((c, s))).max
        (c, 0.5 * rel(c) - 0.5 * mx)
      }
      val (cid, score) = scoredCands.minBy { case (c, sc) => (-sc, c) }
      picks += ((step, cid, score))
      selected ::= cid
    }
    picks.toSeq
  }

  private def toPairsDf(qid: Long, rel: Map[Long, Double],
      sim: Map[(Long, Long), Double]) = {
    val rows = for {
      a <- rel.keys.toSeq
      b <- rel.keys.toSeq if a != b
    } yield (qid, a, rel(a), b, sim((a, b)))
    rows.toDF("qid", "a", "rel", "b", "sim")
  }

  private def symSim(pairs: (Long, Long, Double)*): Map[(Long, Long), Double] =
    pairs.flatMap { case (a, b, s) => Seq((a, b) -> s, (b, a) -> s) }.toMap

  test("matches an independent reference, including negative sims") {
    val rel = Map(1L -> 0.9, 2L -> 0.88, 3L -> 0.5, 4L -> 0.45)
    // 1 and 2 are near-duplicates; 4 is ANTI-correlated with everything —
    // the negative max-sim must help it, not be clamped to zero.
    val sim = symSim(
      (1L, 2L, 0.99), (1L, 3L, 0.1), (1L, 4L, -0.8),
      (2L, 3L, 0.12), (2L, 4L, -0.7), (3L, 4L, -0.6))
    val got = Mmr.rerank(toPairsDf(7L, rel, sim), 4)
      .orderBy("step")
      .select("step", "cid", "mmr_score")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == reference(rel, sim, 4))
    // Diversity behaves: the near-duplicate of the first pick drops behind
    // the dissimilar candidates.
    assert(got.map(_._2) == Seq(1L, 4L, 3L, 2L))
  }

  test("k caps at the candidate count; ties break on lowest id") {
    val rel = Map(10L -> 0.7, 11L -> 0.7)
    val sim = symSim((10L, 11L, 0.0))
    val got = Mmr.rerank(toPairsDf(1L, rel, sim), 8)
      .orderBy("step").select("step", "cid").as[(Int, Long)].collect().toSeq
    assert(got == Seq((1, 10L), (2, 11L)))
  }

  test("queries are independent groups (no cross-query leakage)") {
    val relA = Map(1L -> 0.9, 2L -> 0.1)
    val relB = Map(1L -> 0.2, 2L -> 0.95)
    val sim = symSim((1L, 2L, 0.0))
    val df = toPairsDf(100L, relA, sim).union(toPairsDf(200L, relB, sim))
    val first = Mmr.rerank(df, 1)
      .select("qid", "cid").as[(Long, Long)].collect().toMap
    assert(first == Map(100L -> 1L, 200L -> 2L))
  }
}
