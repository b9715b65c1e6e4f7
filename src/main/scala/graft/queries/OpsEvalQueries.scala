package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Stage, Tables}
import graft.ops.{Dedup, Similarity}

/** Quality-evaluation harnesses for the dedup/ANN families (d7-d9,
  * e10-e11): recall vs exact ground truth, MinHash estimator accuracy,
  * Bloom false-positive-rate measurement. Split out of the former
  * `OpsQueries` monolith unchanged; staging/oracle contract in
  * [[OpsQueries]]'s doc.
  */
object OpsEvalQueries {

  /** Recall@5 of the hyperplane-LSH ANN path against the brute-force exact
    * top-5 — the evaluation harness every ANN deployment runs on a sampled
    * query set before trusting the index. The LSH candidates are staged;
    * BOTH top-5 sets (exact ground truth from the full corpus scan, ANN
    * from the staged candidates) and the per-query hit join are recomputed
    * by the oracle, so the entire eval — scoring, ranking, recall — is
    * hash-verified. The ground truth is deliberately O(queries × corpus):
    * at 100 TB recall eval still brute-forces a SAMPLED query set (the 20
    * broadcast queries here), never the full pairing.
    */
  val annRecall = Q(
    "e10_ann_recall",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 20)
      val cands = Stage.through(
        Similarity.lshCandidatePairs(emb, queries, "vec_id", "embedding",
          planes = 6, probes = 6),
        dir, "e10_cands")
      val ann = Similarity
        .rerankTopK(cands, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      val allPairs = broadcast(queries.select(col("vec_id").as("query_id")))
        .crossJoin(emb.select(col("vec_id").as("neighbor_id")))
        .filter(col("query_id") =!= col("neighbor_id"))
      val exact = Similarity
        .rerankTopK(allPairs, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"))
      exact.join(ann, Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("query_id"), col("n_exact"), col("n_hits"),
          graft.Norm.rz(col("n_hits") / col("n_exact").cast("double"), 4)
            .as("recall_at_5"))
        .orderBy("query_id")
    },
    Some(
      s"""with cands as (
         |  select query_id, neighbor_id from ${Stage.sqlPath("e10_cands")}
         |), ann_pairs as (
         |  select c.query_id, c.neighbor_id, q.embedding as qe, n.embedding as ce
         |  from cands c
         |  join embeddings q on q.vec_id = c.query_id
         |  join embeddings n on n.vec_id = c.neighbor_id
         |), ann_flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from ann_pairs
         |), ann_dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from ann_flat group by query_id, neighbor_id
         |), ann_top as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 desc,
         |          neighbor_id) as rk
         |    from ann_dots) t
         |  where rk <= 5
         |), ex_pairs as (
         |  select q.vec_id as query_id, c.vec_id as neighbor_id,
         |    q.embedding as qe, c.embedding as ce
         |  from embeddings q, embeddings c
         |  where q.vec_id < 20 and c.vec_id != q.vec_id
         |), ex_flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from ex_pairs
         |), ex_dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from ex_flat group by query_id, neighbor_id
         |), ex_top as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 desc,
         |          neighbor_id) as rk
         |    from ex_dots) t
         |  where rk <= 5
         |)
         |select e.query_id,
         |  count(*) as n_exact,
         |  cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |    as bigint) as n_hits,
         |  round(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |    / cast(count(*) as double), 4) + 0.0 as recall_at_5
         |from ex_top e
         |left join ann_top a
         |  on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
         |group by e.query_id
         |order by e.query_id""".stripMargin),
    "ANN eval: recall@5 of LSH candidates vs brute-force exact top-5, fully hash-verified")

  /** Recall@5 for the OTHER index types — IVF cell-probing (e6's
    * construction), PQ-ADC shortlisting (e12's) and int8 scalar
    * quantization (e7's) — against the same brute-force float ground truth
    * as [[annRecall]], one row per (index_type, query). Together with e10
    * this closes the eval loop over all four ANN families: every index the
    * library ships carries a hash-verified recall number, which is the
    * number a 100 TB deployment actually tunes against (nProbe,
    * planes/probes, quantization width, codebook size/shortlist depth).
    * The IVF candidates, the PQ ADC shortlist and the quantized vectors
    * are staged; scoring, ranking, the hit join, and the recall ratio are
    * all recomputed independently by the oracle.
    */
  val annRecallMulti = Q(
    "e11_ann_recall_multi",
    (s, dir) => {
      // The corpus feeds ~12 scans here (two PQ trainings' per-iteration
      // jobs, kmeans steps, four index encodes, five exact reranks, the
      // brute-force ground truth) — persist ONCE so each is a cache read,
      // not a parquet scan. At 100 TB this is the difference between one
      // corpus read and twelve.
      val emb = Tables.embeddings(s, dir).persist()
      val queries = emb.filter(col("vec_id") < 20)
      val seeds = Similarity.sampleCentroids(emb, "vec_id", "embedding", 16)
      val centroids = Similarity.kmeansStep(emb, "embedding",
        Similarity.kmeansStep(emb, "embedding", seeds))
      val ivfCands = Stage.through(
        Similarity.ivfCandidatePairs(emb, queries, "vec_id", "embedding",
          centroids, nProbe = 3),
        dir, "e11_ivf_cands")
      val ivfTop = Similarity
        .rerankTopK(ivfCands, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      val qvecs = Stage.through(
        Similarity.quantizeInt8(emb, "vec_id", "embedding"), dir, "e11_qvecs")
      val quantTop = Similarity
        .quantizedTopK(qvecs, qvecs.filter(col("vec_id") < 20), "vec_id",
          k = 5, c => graft.Norm.rz(c, 4))
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      // PQ leg: the ADC top-100 shortlist is staged (ADC scoring itself is
      // hash-verified end-to-end by e12); the oracle reranks the staged
      // shortlist with exact cosine and scores recall like the other legs.
      val pqCb = Similarity.pqTrain(emb, "vec_id", "embedding",
        subspaces = 8, codes = 32, iters = 3)
      val pqCands = Stage.through(
        Similarity.pqAdcTopK(
            Similarity.pqEncode(emb, "vec_id", "embedding", pqCb),
            queries, "vec_id", "embedding", pqCb, k = 100)
          .select("query_id", "neighbor_id"),
        dir, "e11_pq_cands")
      val pqTop = Similarity
        .rerankTopK(pqCands, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      // Binary leg: sign-pack + Hamming top-5 IS the search (no rerank —
      // the most compressed family trades recall for a 16× scan cut); the
      // oracle rebuilds the packed words from the raw floats, no staging.
      val packed = Similarity.signPack(emb, "vec_id", "embedding")
      val binTop = Similarity
        .binaryTopK(packed, packed.filter(col("vec_id") < 20), "vec_id",
          k = 5)
        .select(col("qid").as("query_id"), col("cid").as("neighbor_id"),
          lit(1L).as("hit"))
      // IVF-PQ leg: residual codebooks over the e11 coarse centroids, the
      // cell-keyed probe + ADC shortlist staged (ADC scoring itself is
      // hash-verified end-to-end by e16), exact rerank to top-5.
      val resid = Similarity.residualsWithCells(emb, "vec_id", "embedding",
        centroids).persist()
      val ivfPqCb = Similarity.pqTrain(resid, "vec_id", "resid",
        subspaces = 8, codes = 32, iters = 2)
      val ivfPqCands = Stage.through(
        Similarity.ivfPqShortlist(
          resid.select(col("vec_id"), col("cell"),
            graft.expressions.PqCodes(col("resid"), ivfPqCb).as("codes")),
          queries, "vec_id", "embedding", centroids, ivfPqCb,
          nProbe = 4, shortlist = 100),
        dir, "e11_ivfpq_cands")
      resid.unpersist()
      val ivfPqTop = Similarity
        .rerankTopK(ivfPqCands, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      // Shared float ground truth (the e10 shape): deliberate broadcast
      // brute-force over the SAMPLED query set.
      val allPairs = broadcast(queries.select(col("vec_id").as("query_id")))
        .crossJoin(emb.select(col("vec_id").as("neighbor_id")))
        .filter(col("query_id") =!= col("neighbor_id"))
      val exact = Similarity
        .rerankTopK(allPairs, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"))
      // Recall assembly in ONE pass (r14): the five ANN top-5 sets union
      // under an index_type tag, the exact truth fans out once per tag
      // (tiny — 5 × |queries|·5 rows), and a single left join + aggregate
      // replaces five join+aggregate branches — the r14 JobProf audit put
      // the per-branch assembly at ~10 of e11's 49 jobs, pure scheduling
      // floor at eval-row counts. The former per-branch exact.persist()
      // goes too: the truth now has exactly one consumer.
      import s.implicits._
      // ONE leg list drives both the tagged union and the type frame — a
      // leg missing from the frame would otherwise be silently dropped by
      // the crossJoin+left-join assembly instead of failing.
      val legs = Seq(ivfTop -> "ivf", pqTop -> "pq",
        quantTop -> "quantized", binTop -> "binary", ivfPqTop -> "ivfpq")
      val tagged = legs
        .map { case (df, t) => df.withColumn("index_type", lit(t)) }
        .reduce(_ unionByName _)
      val types = legs.map(_._2).toDF("index_type")
      exact.crossJoin(broadcast(types))
        .join(tagged, Seq("index_type", "query_id", "neighbor_id"), "left")
        .groupBy("index_type", "query_id")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
        .select(col("index_type"), col("query_id"),
          col("n_exact"), col("n_hits"),
          graft.Norm.rz(col("n_hits") / col("n_exact").cast("double"), 4)
            .as("recall_at_5"))
        .orderBy("index_type", "query_id")
    },
    Some(
      s"""with ex_pairs as (
         |  select q.vec_id as query_id, c.vec_id as neighbor_id,
         |    q.embedding as qe, c.embedding as ce
         |  from embeddings q, embeddings c
         |  where q.vec_id < 20 and c.vec_id != q.vec_id
         |), ex_flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from ex_pairs
         |), ex_dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from ex_flat group by query_id, neighbor_id
         |), ex_top as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 desc,
         |          neighbor_id) as rk
         |    from ex_dots) t
         |  where rk <= 5
         |), ivf_cands as (
         |  select query_id, neighbor_id from ${Stage.sqlPath("e11_ivf_cands")}
         |), ivf_pairs as (
         |  select c.query_id, c.neighbor_id, q.embedding as qe, n.embedding as ce
         |  from ivf_cands c
         |  join embeddings q on q.vec_id = c.query_id
         |  join embeddings n on n.vec_id = c.neighbor_id
         |), ivf_flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from ivf_pairs
         |), ivf_dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from ivf_flat group by query_id, neighbor_id
         |), ivf_top as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 desc,
         |          neighbor_id) as rk
         |    from ivf_dots) t
         |  where rk <= 5
         |), qv as (
         |  select vec_id, scale, qvec from ${Stage.sqlPath("e11_qvecs")}
         |), q_pairs as (
         |  select q.vec_id as query_id, c.vec_id as neighbor_id,
         |    q.scale as qs, c.scale as cs, q.qvec as qvv, c.qvec as cv
         |  from qv q, qv c
         |  where q.vec_id < 20 and c.vec_id != q.vec_id
         |), q_flat as (
         |  select query_id, neighbor_id, qs, cs,
         |    unnest(qvv)::bigint as a, unnest(cv)::bigint as b
         |  from q_pairs
         |), q_dots as (
         |  select query_id, neighbor_id, any_value(qs) as qs, any_value(cs) as cs,
         |    sum(a * b) as dp, sum(a * a) as nq, sum(b * b) as nc
         |  from q_flat group by query_id, neighbor_id
         |), q_top as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by round((dp::double * qs * cs) /
         |          nullif(sqrt(nq::double) * qs * (sqrt(nc::double) * cs), 0),
         |          4) + 0.0 desc, neighbor_id) as rk
         |    from q_dots) t
         |  where rk <= 5
         |), pq_cands as (
         |  select query_id, neighbor_id from ${Stage.sqlPath("e11_pq_cands")}
         |), pq_pairs as (
         |  select c.query_id, c.neighbor_id, q.embedding as qe, n.embedding as ce
         |  from pq_cands c
         |  join embeddings q on q.vec_id = c.query_id
         |  join embeddings n on n.vec_id = c.neighbor_id
         |), pq_flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from pq_pairs
         |), pq_dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from pq_flat group by query_id, neighbor_id
         |), pq_top as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 desc,
         |          neighbor_id) as rk
         |    from pq_dots) t
         |  where rk <= 5
         |), leg_ivf as (
         |  select 'ivf' as index_type, e.query_id,
         |    count(*) as n_exact,
         |    cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      as bigint) as n_hits,
         |    round(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      / cast(count(*) as double), 4) + 0.0 as recall_at_5
         |  from ex_top e
         |  left join ivf_top a
         |    on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
         |  group by e.query_id
         |), leg_q as (
         |  select 'quantized' as index_type, e.query_id,
         |    count(*) as n_exact,
         |    cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      as bigint) as n_hits,
         |    round(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      / cast(count(*) as double), 4) + 0.0 as recall_at_5
         |  from ex_top e
         |  left join q_top a
         |    on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
         |  group by e.query_id
         |), leg_pq as (
         |  select 'pq' as index_type, e.query_id,
         |    count(*) as n_exact,
         |    cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      as bigint) as n_hits,
         |    round(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      / cast(count(*) as double), 4) + 0.0 as recall_at_5
         |  from ex_top e
         |  left join pq_top a
         |    on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
         |  group by e.query_id
         |), bin_flat as (
         |  select vec_id, unnest(embedding) as x,
         |         generate_subscripts(embedding, 1) - 1 as i
         |  from embeddings
         |), bin_words as (
         |  select vec_id,
         |    sum(case when i < 32 and x > 0 then (1::bigint << i) else 0 end)::bigint as w0,
         |    sum(case when i >= 32 and x > 0 then (1::bigint << (i - 32)) else 0 end)::bigint as w1
         |  from bin_flat group by vec_id
         |), bin_top as (
         |  select query_id, neighbor_id from (
         |    select q.vec_id as query_id, c.vec_id as neighbor_id,
         |      row_number() over (partition by q.vec_id
         |        order by bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)),
         |          c.vec_id) as rk
         |    from bin_words q join bin_words c
         |      on q.vec_id < 20 and c.vec_id != q.vec_id) t
         |  where rk <= 5
         |), ivfpq_cands as (
         |  select query_id, neighbor_id from ${Stage.sqlPath("e11_ivfpq_cands")}
         |), ivfpq_pairs as (
         |  select c.query_id, c.neighbor_id, q.embedding as qe, n.embedding as ce
         |  from ivfpq_cands c
         |  join embeddings q on q.vec_id = c.query_id
         |  join embeddings n on n.vec_id = c.neighbor_id
         |), ivfpq_flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from ivfpq_pairs
         |), ivfpq_dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from ivfpq_flat group by query_id, neighbor_id
         |), ivfpq_top as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 desc,
         |          neighbor_id) as rk
         |    from ivfpq_dots) t
         |  where rk <= 5
         |), leg_binary as (
         |  select 'binary' as index_type, e.query_id,
         |    count(*) as n_exact,
         |    cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      as bigint) as n_hits,
         |    round(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      / cast(count(*) as double), 4) + 0.0 as recall_at_5
         |  from ex_top e
         |  left join bin_top a
         |    on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
         |  group by e.query_id
         |), leg_ivfpq as (
         |  select 'ivfpq' as index_type, e.query_id,
         |    count(*) as n_exact,
         |    cast(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      as bigint) as n_hits,
         |    round(sum(case when a.neighbor_id is not null then 1 else 0 end)
         |      / cast(count(*) as double), 4) + 0.0 as recall_at_5
         |  from ex_top e
         |  left join ivfpq_top a
         |    on a.query_id = e.query_id and a.neighbor_id = e.neighbor_id
         |  group by e.query_id
         |)
         |select * from leg_ivf
         |union all
         |select * from leg_pq
         |union all
         |select * from leg_q
         |union all
         |select * from leg_binary
         |union all
         |select * from leg_ivfpq
         |order by index_type, query_id""".stripMargin),
    "ANN eval: recall@5 of IVF, IVF-PQ, PQ-ADC, int8 and binary search vs exact top-5 — every index family eval'd")

  /** Dedup candidate-stage evaluation — the d-family analog of e10/e11:
    * precision/recall of each blocking family's CANDIDATE pairs against
    * exact Jaccard ≥ 0.5 ground truth. Recall is the number that matters
    * at scale (the exact rerank restores precision but can never recover a
    * pair the blocking missed), and it is exactly what a 100 TB run can't
    * measure on itself — so the pipeline's quality gate is this query run
    * on a sample. The two candidate sets (MinHash-LSH banded buckets,
    * SimHash chunk-banded buckets — both with their production skew caps
    * ON) are staged; the DuckDB oracle recomputes the exact shingle-Jaccard
    * ground truth from raw text (the t6 shape, unlimited) and both metric
    * rows from the staged bytes. Counts are exact integers; only the two
    * ratios round.
    */
  val dedupEval = Q(
    "d7_dedup_eval",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // ONE shingle pass feeds both the LSH candidate generator and the
      // exact ground truth (each would otherwise re-shingle the corpus).
      val sh = Dedup.shingles(docs, "text", 5).persist()
      val lshCands = Stage.through(
        Dedup.candidatePairsFromShingles(sh).select("d1", "d2").distinct(),
        dir, "d7_lsh_cands")
      val simCands = Stage.through(
        Dedup.simhashCandidatePairs(Dedup.simhash64(docs))
          .select("d1", "d2").distinct(),
        dir, "d7_sim_cands")
      // truth feeds two consumers (the count aggregate + the hit join):
      // persist so the blocked self-join computes once, not twice.
      val truth = Dedup.exactJaccardPairsFromShingles(sh)
        .filter(col("jaccard") >= 0.5).select("d1", "d2").persist()
      // Metrics assembly in ONE pass over a method-tagged union of the two
      // candidate sets (each distinct on (d1, d2), so the inner-join hit
      // count equals the former per-method semi-join count): 3 aggregates +
      // 1 join instead of 6 aggregates + 2 semi-joins + 4 cross joins — the
      // r14 JobProf audit measured the per-branch assembly at ~15 of d7's
      // 46 jobs, pure scheduling floor at any scale's metrics row counts.
      // The literal method frame keeps a zero-candidate method's row (the
      // old per-method aggregate emitted one row even over empty input).
      import s.implicits._
      // ONE method list drives both the tagged union and the method frame
      // (same discipline as e11's legs — divergence would silently drop a
      // method's row).
      val methods = Seq(lshCands -> "lsh", simCands -> "simhash")
      val tagged = methods
        .map { case (df, m) => df.withColumn("method", lit(m)) }
        .reduce(_ unionByName _)
      val candCounts = tagged.groupBy("method")
        .agg(count(lit(1)).as("n_cands"))
      val hitCounts = truth.join(tagged, Seq("d1", "d2"))
        .groupBy("method").agg(count(lit(1)).as("n_hits"))
      methods.map(_._2).toDF("method")
        .join(candCounts, Seq("method"), "left")
        .join(hitCounts, Seq("method"), "left")
        .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
        .select(col("method"),
          coalesce(col("n_cands"), lit(0L)).as("n_cands"),
          col("n_truth"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .select(col("method"), col("n_cands"), col("n_truth"), col("n_hits"),
          graft.Norm.rz(col("n_hits") /
            nullif(col("n_cands").cast("double"), lit(0.0)), 4).as("prec"),
          graft.Norm.rz(col("n_hits") /
            nullif(col("n_truth").cast("double"), lit(0.0)), 4)
            .as("recall"))
        .orderBy("method")
    },
    Some(
      s"""with toks as (
         |  select doc_id, string_split(text, ' ') as t from documents
         |), sub as (
         |  select doc_id, t, generate_subscripts(t, 1) as i from toks
         |), sh as (
         |  select distinct doc_id, array_to_string(t[i:i+4], ' ') as shingle
         |  from sub where i <= greatest(len(t) - 5, 0) + 1
         |), sizes as (
         |  select doc_id, count(*) as n from sh group by doc_id
         |), pairs as (
         |  select a.doc_id as d1, b.doc_id as d2, count(*) as inter
         |  from sh a join sh b on a.shingle = b.shingle and a.doc_id < b.doc_id
         |  group by 1, 2
         |), truth as (
         |  select d1, d2 from pairs
         |  join sizes s1 on d1 = s1.doc_id
         |  join sizes s2 on d2 = s2.doc_id
         |  where cast(inter as double) / (s1.n + s2.n - inter) >= 0.5
         |), lshc as (
         |  select distinct d1, d2 from ${Stage.sqlPath("d7_lsh_cands")}
         |), simc as (
         |  select distinct d1, d2 from ${Stage.sqlPath("d7_sim_cands")}
         |), m as (
         |  select 'lsh' as method,
         |    (select count(*) from lshc) as n_cands,
         |    (select count(*) from truth) as n_truth,
         |    (select count(*) from truth t
         |       join lshc c on t.d1 = c.d1 and t.d2 = c.d2) as n_hits
         |  union all
         |  select 'simhash' as method,
         |    (select count(*) from simc) as n_cands,
         |    (select count(*) from truth) as n_truth,
         |    (select count(*) from truth t
         |       join simc c on t.d1 = c.d1 and t.d2 = c.d2) as n_hits
         |)
         |select method, n_cands, n_truth, n_hits,
         |  round(n_hits / nullif(cast(n_cands as double), 0.0), 4) + 0.0
         |    as prec,
         |  round(n_hits / nullif(cast(n_truth as double), 0.0), 4) + 0.0
         |    as recall
         |from m
         |order by method""".stripMargin),
    "dedup eval: candidate-stage precision/recall of LSH + SimHash blocking vs exact Jaccard>=0.5 truth")

  /** MinHash ESTIMATE accuracy: the matching-component fraction of two
    * docs' 32-function signatures is an unbiased estimator of their Jaccard
    * similarity — the property the whole MinHash/LSH family rests on
    * (Broder 1997). For every pair with exact Jaccard ≥ 0.2 (3-shingles),
    * ship estimate vs exact vs |error|. Completes the measured-accuracy
    * story: every approximation in the library now carries a quantifying
    * query (LSH/IVF/PQ/int8/binary recall e10/e11, Count-Min overestimate
    * t40, HLL relative error t41, sampled-quantile error t43, blocking
    * precision/recall d7 — and MinHash estimation error here). The
    * estimate (agree/32) is a dyadic rational — exact in doubles, no FP
    * ambiguity cross-engine; signatures rebuild from md5 strings on both
    * sides, so nothing is staged.
    *
    * Scale shape: one shingle pass (persisted across the signature agg,
    * the size agg and the pair join), one shingle-keyed self-join bounded
    * by co-occurrence (the t6 plan), one signature agg — all keyed
    * shuffles; the 32-column agreement compare is a broadcast-free
    * projection on the ≥0.2 pair set.
    */
  val minhashAccuracy = Q(
    "d8_minhash_accuracy",
    (s, dir) => {
      val nFns = 32
      val sh = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.expressions.ShingleStrings(
            split(col("text"), " "), 3)).as("shingle"))
        .persist()
      val aggs = (0 until nFns).map(j =>
        min(md5(concat_ws(":", lit(j.toString), col("shingle"))))
          .as(s"mh$j"))
      val sigs = sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val exact = sh.as("a")
        .join(sh.as("b"),
          col("a.shingle") === col("b.shingle") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
        .select(col("d1"), col("d2"),
          (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
            .as("jac"))
        .filter(col("jac") >= 0.2)
      val sa = sigs.select(col("doc_id").as("d1") +:
        (0 until nFns).map(j => col(s"mh$j").as(s"a_mh$j")): _*)
      val sb = sigs.select(col("doc_id").as("d2") +:
        (0 until nFns).map(j => col(s"mh$j").as(s"b_mh$j")): _*)
      val agree = (0 until nFns).map(j =>
        when(col(s"a_mh$j") === col(s"b_mh$j"), 1).otherwise(0))
        .reduce(_ + _)
      exact.join(sa, "d1").join(sb, "d2")
        .select(col("d1"), col("d2"),
          graft.Norm.rz(col("jac"), 6).as("exact_jaccard"),
          graft.Norm.rz(agree.cast("double") / nFns, 6).as("est_jaccard"),
          graft.Norm.rz(abs(agree.cast("double") / nFns - col("jac")), 6)
            .as("abs_err"))
        .orderBy("d1", "d2")
    },
    Some {
      val nFns = 32
      val mins = (0 until nFns)
        .map(j => s"min(md5(concat_ws(':', '$j', shingle))) as mh$j")
        .mkString(",\n        ")
      val agree = (0 until nFns)
        .map(j => s"case when a.mh$j = b.mh$j then 1 else 0 end")
        .mkString(" + ")
      s"""with toks as (
         |  select doc_id, string_split(text, ' ') as t from documents
         |), sub as (
         |  select doc_id, t, generate_subscripts(t, 1) as i from toks
         |), sh as (
         |  select distinct doc_id, array_to_string(t[i:i+2], ' ') as shingle
         |  from sub where i <= greatest(len(t) - 3, 0) + 1
         |), sigs as (
         |  select doc_id,
         |        $mins
         |  from sh group by doc_id
         |), sizes as (
         |  select doc_id, count(*) as n from sh group by doc_id
         |), pairs as (
         |  select x.doc_id as d1, y.doc_id as d2, count(*) as inter
         |  from sh x join sh y
         |    on x.shingle = y.shingle and x.doc_id < y.doc_id
         |  group by 1, 2
         |), exact as (
         |  select d1, d2,
         |    cast(inter as double) / (s1.n + s2.n - inter) as jac
         |  from pairs
         |  join sizes s1 on d1 = s1.doc_id
         |  join sizes s2 on d2 = s2.doc_id
         |  where cast(inter as double) / (s1.n + s2.n - inter) >= 0.2
         |)
         |select e.d1, e.d2,
         |  round(e.jac, 6) + 0.0 as exact_jaccard,
         |  round(($agree) / 32.0, 6) + 0.0 as est_jaccard,
         |  round(abs(($agree) / 32.0 - e.jac), 6) + 0.0 as abs_err
         |from exact e
         |join sigs a on a.doc_id = e.d1
         |join sigs b on b.doc_id = e.d2
         |order by e.d1, e.d2""".stripMargin
    },
    "dedup eval: MinHash 32-fn Jaccard estimate vs exact, per near-dup pair")

  /** Bloom filter false-positive rate, MEASURED (Bloom 1970): build an
    * m=4096-bit / k=3 filter over the corpus's distinct content hashes with
    * md5-derived bit positions — so the DuckDB oracle rebuilds the filter
    * itself, not a staged copy — then probe 1000 keys that are absent by
    * construction and count how many the filter wrongly admits. Quantifies
    * the d5 incremental-dedup prefilter: its cost model is exactly this
    * FPR (every false positive pays the exact verify join). The filter is
    * deliberately undersized for the key count (m/n ≈ 0.8 bit/key) so the
    * measured FPR is far from 0 and the row actually tests the math;
    * `members_all_hit` doubles as the no-false-negative proof (must equal
    * n_keys). FPR = n_fp/n_probes is an exact rational — no FP ambiguity.
    *
    * Scale shape: the bit table is ≤ m rows NO MATTER the corpus size
    * (the sketch contract, as t41's registers); one distinct over content
    * hashes, one distinct over k·n positions, then two broadcast-sized
    * joins of (probes × k) and (members × k) against the ≤ m-row bit set.
    */
  val bloomFpr = Q(
    "d9_bloom_fpr",
    (s, dir) => {
      val m = 4096
      val k = 3
      val md5int = (c: org.apache.spark.sql.Column) =>
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      val keys = Tables.documents(s, dir)
        .select(md5(col("text")).as("key")).distinct()
      def positions(keyed: DataFrame): DataFrame = keyed
        .select(col("key"), explode(array((0 until k).map(lit): _*)).as("j"))
        .select(col("key"),
          pmod(md5int(concat_ws(":", col("j"), col("key"))), lit(m.toLong))
            .as("pos"))
      val bits = positions(keys).select("pos").distinct()
      // Probe keys absent by construction: members are 32-char hex md5
      // strings; "probe:i" can never collide with one.
      val probes = s.range(1000)
        .select(concat(lit("probe:"), col("id")).as("key"))
      def hits(keyed: DataFrame): DataFrame = positions(keyed)
        .join(bits, Seq("pos"), "left_semi")
        .groupBy("key").agg(count(lit(1)).as("nset"))
        .filter(col("nset") === k)
      val nKeys = keys.agg(count(lit(1)).as("n_keys"))
      val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
      val nFp = hits(probes).agg(count(lit(1)).as("n_fp"))
      val nMemberHits = hits(keys).agg(count(lit(1)).as("members_all_hit"))
      nKeys.crossJoin(nBits).crossJoin(nFp).crossJoin(nMemberHits)
        .select(col("n_keys"), col("n_bits_set"), col("members_all_hit"),
          col("n_fp"),
          graft.Norm.rz(col("n_fp") / lit(1000.0), 6).as("fpr"))
    },
    Some(s"""with keys as (
      select distinct md5(text) as key from documents
    ), kk as (select unnest([0, 1, 2]) as j
    ), bits as (
      select distinct
        (('0x' || substr(md5(j || ':' || key), 1, 15))::bigint % 4096) as pos
      from keys, kk
    ), probes as (
      select 'probe:' || i as key from generate_series(0, 999) t(i)
    ), probe_hits as (
      select p.key, count(*) as nset
      from probes p, kk
      where (('0x' || substr(md5(kk.j || ':' || p.key), 1, 15))::bigint
               % 4096) in (select pos from bits)
      group by p.key
    ), member_hits as (
      select ks.key, count(*) as nset
      from keys ks, kk
      where (('0x' || substr(md5(kk.j || ':' || ks.key), 1, 15))::bigint
               % 4096) in (select pos from bits)
      group by ks.key
    )
    select
      (select count(*) from keys) as n_keys,
      (select count(*) from bits) as n_bits_set,
      (select count(*) from member_hits where nset = 3) as members_all_hit,
      (select count(*) from probe_hits where nset = 3) as n_fp,
      round((select count(*) from probe_hits where nset = 3) / 1000.0, 6)
        + 0.0 as fpr"""),
    "dedup eval: cross-engine Bloom filter — measured FPR on absent probes, zero false negatives")
}
