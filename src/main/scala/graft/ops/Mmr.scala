package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance (MMR) diversity re-ranking (Carbonell &
  * Goldstein, SIGIR 1998) — the standard post-retrieval step that trades
  * relevance against redundancy when assembling a result list (RAG context
  * selection, diverse negative mining, dedup of a retrieved set):
  *
  *   MMR(c) = λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)
  *
  * selecting greedily for k steps. The greedy recurrence is inherently
  * sequential in k, but only over each query's OWN candidate list — which an
  * ANN cut has already bounded (top-20 here). So the scale shape is: the
  * candidate generation is the distributed work (ANN — see
  * [[Similarity.bruteForceTopK]] / the IVF/LSH/PQ paths), and the greedy
  * loop is a per-query kernel over ≤ candidates² pair similarities, run via
  * typed `flatMapGroups` — one shuffle on query id, constant memory per
  * group, embarrassingly parallel across queries. Same sanctioned-kernel
  * shape as Welch (SURVEY §2.13): iterative per-group math that Catalyst
  * cannot express is a typed kernel, never a driver-side loop.
  *
  * Determinism contract (oracle parity): `rel` and `sim` arrive already
  * rounded to 4 digits, λ = 0.5 so both MMR terms are exact IEEE halvings,
  * and ties break on ascending candidate id — bit-identical to a SQL engine
  * replaying `row_number() over (order by 0.5*rel - 0.5*maxsim desc, cid)`
  * on the same rounded inputs.
  */
object Mmr {

  /** One candidate-pair observation: candidate `a` (with its relevance to
    * the query) against co-candidate `b` with their mutual similarity.
    */
  final case class PairRow(qid: Long, a: Long, rel: Double, b: Long, sim: Double)

  /** One greedy selection: the candidate picked at `step`, the max
    * similarity it had to the already-selected set at pick time (0.0 for
    * the first pick), and its raw MMR score.
    */
  final case class Selection(
      qid: Long, step: Int, cid: Long, rel: Double,
      max_sel_sim: Double, mmr_score: Double)

  /** Greedy MMR over per-query candidate pair lists. `pairs` must hold one
    * row per ordered candidate pair (a ≠ b) per query: (qid, a, rel, b,
    * sim); every candidate appears as `a` at least once. λ is fixed at 0.5
    * (exact in binary — no rounding divergence between engines).
    */
  def rerank(pairs: DataFrame, k: Int): DataFrame = {
    val session = pairs.sparkSession
    import session.implicits._
    pairs
      .select(
        col("qid").cast("long"), col("a").cast("long"),
        col("rel").cast("double"), col("b").cast("long"),
        col("sim").cast("double"))
      .as[PairRow]
      .groupByKey(_.qid)
      .flatMapGroups { (qid: Long, it: Iterator[PairRow]) =>
        val rows = it.toArray
        val rel = scala.collection.mutable.LinkedHashMap[Long, Double]()
        rows.foreach(r => rel(r.a) = r.rel)
        val sim = rows.iterator.map(r => (r.a, r.b) -> r.sim).toMap
        // Ascending-id candidate order + strict `>` comparison = lowest id
        // wins score ties, matching SQL's `order by score desc, cid`.
        val cands = rel.keysIterator.toArray.sorted
        val selected = scala.collection.mutable.ArrayBuffer[Long]()
        val out = scala.collection.mutable.ArrayBuffer[Selection]()
        val steps = math.min(k, cands.length)
        var step = 1
        while (step <= steps) {
          var bestId = -1L
          var bestScore = Double.NegativeInfinity
          var bestMax = 0.0
          var i = 0
          while (i < cands.length) {
            val c = cands(i)
            if (!selected.contains(c)) {
              // max over the selected set — sims can be NEGATIVE (cosine),
              // so seed with -inf once anything is selected; the step-1
              // diversity term is defined as 0.0.
              var maxSim =
                if (selected.isEmpty) 0.0 else Double.NegativeInfinity
              var j = 0
              while (j < selected.length) {
                val sm = sim.getOrElse((c, selected(j)), 0.0)
                if (sm > maxSim) maxSim = sm
                j += 1
              }
              val score = 0.5 * rel(c) - 0.5 * maxSim
              if (score > bestScore) {
                bestId = c; bestScore = score; bestMax = maxSim
              }
            }
            i += 1
          }
          selected += bestId
          out += Selection(qid, step, bestId, rel(bestId), bestMax, bestScore)
          step += 1
        }
        out
      }
      .toDF()
  }
}
