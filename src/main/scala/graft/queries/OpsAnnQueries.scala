package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Stage, Tables}
import graft.ops.Similarity

/** Approximate-nearest-neighbor index families over the embeddings
  * table (e4-e7, e12, e16): exact embedding near-dup plus LSH / IVF /
  * PQ-ADC / IVF-PQ search. Split out of the former `OpsQueries`
  * monolith unchanged; staging/oracle contract in [[OpsQueries]]'s doc.
  */
object OpsAnnQueries {

  /** Exact embedding near-dup pairs (cosine ≥ 0.8): triangular block-grid
    * self-join ([[Similarity.blockedExactPairs]] — no driver collect, no
    * full-matrix broadcast) against DuckDB's all-pairs
    * list_cosine_similarity oracle.
    */
  val embNearDupExact = Q(
    "e4_embedding_neardup",
    (s, dir) =>
      Similarity.blockedExactPairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", minCosine = 0.8)
        .select(col("id1"), col("id2"),
          graft.Norm.rz(col("cosine"), 4).as("cosine"))
        .filter(col("cosine") >= 0.8)
        .orderBy(col("cosine").desc, col("id1"), col("id2")),
    Some("""select a.vec_id as id1, b.vec_id as id2,
      round(list_cosine_similarity(a.embedding, b.embedding), 4) + 0.0 as cosine
    from embeddings a join embeddings b on a.vec_id < b.vec_id
    where round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.8
    order by cosine desc, id1, id2"""),
    "similarity: exact cosine near-dup pairs (oracle: list_cosine_similarity)")

  /** LSH-bucketed ANN top-5 for the first 20 vectors — the scale path for
    * e1's brute force. Bucket-join candidates (recall verified in
    * SimilaritySpec) are staged; both engines rerank the SAME candidates
    * with exact cosine and rank on (rounded cosine desc, neighbor_id), so
    * scoring + ranking are hash-checked.
    */
  val lshAnn = Q(
    "e5_lsh_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cands = Stage.through(
        Similarity.lshCandidatePairs(emb, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding"),
        dir, "e5_cands")
      Similarity.rerankTopK(cands, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },
    Some(
      s"""with cands as (
         |  select query_id, neighbor_id from ${Stage.sqlPath("e5_cands")}
         |), pairs as (
         |  select c.query_id, c.neighbor_id, q.embedding as qe, n.embedding as ce
         |  from cands c
         |  join embeddings q on q.vec_id = c.query_id
         |  join embeddings n on n.vec_id = c.neighbor_id
         |), flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from pairs
         |), dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from flat group by query_id, neighbor_id
         |), scored as (
         |  select query_id, neighbor_id,
         |    round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as cosine
         |  from dots
         |)
         |select query_id, neighbor_id, cosine, rank from (
         |  select query_id, neighbor_id, cosine,
         |    row_number() over (partition by query_id order by cosine desc, neighbor_id) as rank
         |  from scored) t
         |where rank <= 5
         |order by query_id, rank""".stripMargin),
    "similarity: hyperplane-LSH ANN candidates (staged) + hash-verified rerank/rank")

  /** IVF-probed ANN top-5 for the first 20 vectors — the inverted-file
    * alternative to e5's hyperplane LSH: coarse centroids (lowest-id seeds +
    * two distributed Lloyd refinements), corpus assigned to one cell each,
    * queries probe their 3 best cells. Candidates are staged; the exact
    * rerank + ranking are hash-verified like e5's (recall spec in IvfSpec).
    */
  val ivfAnn = Q(
    "e6_ivf_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val seeds = Similarity.sampleCentroids(emb, "vec_id", "embedding", 16)
      val centroids = Similarity.kmeansStep(emb, "embedding",
        Similarity.kmeansStep(emb, "embedding", seeds))
      val cands = Stage.through(
        Similarity.ivfCandidatePairs(emb, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding", centroids, nProbe = 3),
        dir, "e6_cands")
      Similarity.rerankTopK(cands, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },
    Some(
      s"""with cands as (
         |  select query_id, neighbor_id from ${Stage.sqlPath("e6_cands")}
         |), pairs as (
         |  select c.query_id, c.neighbor_id, q.embedding as qe, n.embedding as ce
         |  from cands c
         |  join embeddings q on q.vec_id = c.query_id
         |  join embeddings n on n.vec_id = c.neighbor_id
         |), flat as (
         |  select query_id, neighbor_id,
         |    unnest(qe)::double as x, unnest(ce)::double as y
         |  from pairs
         |), dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from flat group by query_id, neighbor_id
         |), scored as (
         |  select query_id, neighbor_id,
         |    round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as cosine
         |  from dots
         |)
         |select query_id, neighbor_id, cosine, rank from (
         |  select query_id, neighbor_id, cosine,
         |    row_number() over (partition by query_id order by cosine desc, neighbor_id) as rank
         |  from scored) t
         |where rank <= 5
         |order by query_id, rank""".stripMargin),
    "similarity: IVF cell-probed ANN candidates (staged) + hash-verified rerank/rank")

  /** Product-quantization ANN (Jégou et al., TPAMI 2011 — public
    * literature): the memory-bound scale path beyond int8 — a 64-dim float
    * vector (256 B) compresses to 8 one-byte codes, so a 100 TB embedding
    * corpus's scan side shrinks 32× and the whole index fits executor
    * memory at sizes scalar quantization can't touch. Codebooks (8
    * subspaces × 16 centroids, Lloyd-trained in one distributed job per
    * iteration) and the encoded corpus are both STAGED; the DuckDB oracle
    * then recomputes the ENTIRE asymmetric-distance search — per-subspace
    * query·centroid contributions, their sum, rounding, ranking — from the
    * same staged bytes, so the ADC scoring path is hash-verified end to
    * end. Spark scores via per-query lookup tables (the real ADC kernel:
    * M table lookups per corpus row, built as codegen'd column
    * expressions); the oracle mirrors it as a (sub, code) join + group-sum.
    * ADC is a SHORTLIST stage — coarse codes tie near-identical rows — so
    * the search finishes with an exact cosine rerank of the top-50
    * shortlist, the production IVF-PQ topology: full float vectors are
    * touched for 50·|queries| rows only, never corpus-wide. Training /
    * encoding quality is spec-verified (PqSpec: recall vs brute force,
    * reconstruction-dot equivalence, nearest-centroid routing).
    */
  val pqAnn = Q(
    "e12_pq_ann",
    (s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding",
        subspaces = 8, codes = 32, iters = 3)
      val cbRows = for {
        m <- cb.indices; c <- cb(m).indices
      } yield (m, c, cb(m)(c).toSeq)
      Stage.through(cbRows.toDF("sub", "code", "centroid"), dir,
        "e12_codebooks")
      val coded = Stage.through(
        Similarity.pqEncode(emb, "vec_id", "embedding", cb),
        dir, "e12_codes")
      Similarity.pqSearchTopK(coded, emb.filter(col("vec_id") < 20), emb,
          "vec_id", "embedding", cb, k = 5, shortlist = 100)
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rank"))
        .orderBy("query_id", "rank")
    },
    Some(
      s"""with cb as (
         |  select sub, code, centroid from ${Stage.sqlPath("e12_codebooks")}
         |), coded as (
         |  select vec_id, codes from ${Stage.sqlPath("e12_codes")}
         |), q as (
         |  select vec_id as query_id, embedding from embeddings
         |  where vec_id < 20
         |), expanded as (
         |  select vec_id as neighbor_id, i - 1 as sub, codes[i] as code
         |  from (select vec_id, codes, generate_subscripts(codes, 1) as i
         |        from coded) t
         |), contrib as (
         |  select q.query_id, e.neighbor_id,
         |    list_dot_product(cb.centroid,
         |      q.embedding[e.sub * 8 + 1 : e.sub * 8 + 8]::double[]) as c
         |  from expanded e
         |  join cb on cb.sub = e.sub and cb.code = e.code
         |  cross join q
         |  where e.neighbor_id != q.query_id
         |), adc as (
         |  select query_id, neighbor_id, round(sum(c), 4) + 0.0 as adc_score
         |  from contrib group by query_id, neighbor_id
         |), shortlist as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (
         |        partition by query_id
         |        order by adc_score desc, neighbor_id) as srn
         |    from adc) t
         |  where srn <= 100
         |), pairs as (
         |  select s.query_id, s.neighbor_id, qe.embedding as qv,
         |    ne.embedding as nv
         |  from shortlist s
         |  join embeddings qe on qe.vec_id = s.query_id
         |  join embeddings ne on ne.vec_id = s.neighbor_id
         |), flat as (
         |  select query_id, neighbor_id,
         |    unnest(qv)::double as x, unnest(nv)::double as y
         |  from pairs
         |), dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from flat group by query_id, neighbor_id
         |), reranked as (
         |  select query_id, neighbor_id,
         |    round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as cosine
         |  from dots
         |)
         |select query_id, neighbor_id, cosine, rank from (
         |  select query_id, neighbor_id, cosine,
         |    row_number() over (
         |      partition by query_id order by cosine desc, neighbor_id) as rank
         |  from reranked) t
         |where rank <= 5
         |order by query_id, rank""".stripMargin),
    "similarity: product-quantization ANN — staged codebooks + codes, hash-verified ADC shortlist + exact rerank")

  /** IVF-PQ — the production billion-vector index (Jégou et al. 2011 §IV,
    * the FAISS `IVFxx,PQyy` shape): a coarse inverted file prunes the scan
    * to the probed cells' posting lists AND the PQ codebooks are trained on
    * CELL RESIDUALS, spending their 8 bytes on within-cell detail the
    * coarse quantizer already removed — strictly better rate-distortion
    * than flat PQ (e12) at equal code size, on top of the nProbe/nCells
    * scan reduction flat PQ doesn't have. Search decomposes the inner
    * product exactly: q·x̂ = q·c(cell) + q·r̂, so each query carries ONE
    * residual-codebook LUT (PqLut on the full query vector — the subspace
    * dot with a residual centroid IS q·r̂'s contribution) plus a scalar
    * q·centroid offset per probed cell; candidates come from a CELL-KEYED
    * join (the inverted-file probe — never a corpus-wide scan), each scored
    * by 8 table lookups + one add. Centroids, residual codebooks and the
    * (cell, codes) index are STAGED; the oracle recomputes cell probing,
    * the offset, the full ADC sum, the shortlist cut and the exact rerank
    * from those bytes + raw embeddings. Rounding discipline: probe scores
    * and ADC totals round at 4 before their rank windows (id tie-breaks),
    * so no cross-engine ulp can flip a probe or a shortlist membership.
    */
  val ivfPqAnn = Q(
    "e16_ivfpq_ann",
    (s, dir) => {
      import s.implicits._
      val emb = Tables.embeddings(s, dir)
      val nCells = 16
      val nProbe = 4
      var cents = Similarity.sampleCentroids(emb, "vec_id", "embedding",
        nCells)
      for (_ <- 0 until 2)
        cents = Similarity.kmeansStep(emb, "embedding", cents)
      Stage.through(
        cents.toIndexedSeq.zipWithIndex
          .map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid"),
        dir, "e16_centroids")
      val resid = Similarity.residualsWithCells(emb, "vec_id", "embedding",
        cents).persist()
      val cbr = Similarity.pqTrain(resid, "vec_id", "resid",
        subspaces = 8, codes = 32, iters = 2)
      val cbRows = for {
        m <- cbr.indices; c <- cbr(m).indices
      } yield (m, c, cbr(m)(c).toSeq)
      Stage.through(cbRows.toDF("sub", "code", "centroid"), dir,
        "e16_codebooks")
      val coded = Stage.through(
        resid.select(col("vec_id"), col("cell"),
          graft.expressions.PqCodes(col("resid"), cbr).as("codes")),
        dir, "e16_codes")
      resid.unpersist()

      val shortlist = Similarity.ivfPqShortlist(coded,
        emb.filter(col("vec_id") < 20), "vec_id", "embedding",
        cents, cbr, nProbe, shortlist = 50)
      Similarity.rerankTopK(shortlist, emb, "vec_id", "embedding", 5,
          Some(4))
        .select(col("query_id"), col("neighbor_id"), col("cosine"),
          col("rank"))
        .orderBy("query_id", "rank")
    },
    Some(
      s"""with cent as (
         |  select cell, centroid from ${Stage.sqlPath("e16_centroids")}
         |), cb as (
         |  select sub, code, centroid from ${Stage.sqlPath("e16_codebooks")}
         |), coded as (
         |  select vec_id, cell, codes from ${Stage.sqlPath("e16_codes")}
         |), q as (
         |  select vec_id as query_id, embedding from embeddings
         |  where vec_id < 20
         |), cellscore as (
         |  select q.query_id, cent.cell, q.embedding,
         |    list_dot_product(cent.centroid, q.embedding::double[]) as cdot_raw,
         |    round(list_dot_product(cent.centroid, q.embedding::double[])
         |      - list_dot_product(cent.centroid, cent.centroid) / 2, 4) + 0.0
         |      as pscore
         |  from q cross join cent
         |), probed as (
         |  select query_id, cell, embedding, cdot_raw from (
         |    select query_id, cell, embedding, cdot_raw,
         |      row_number() over (partition by query_id
         |        order by pscore desc, cell) as prn
         |    from cellscore) t
         |  where prn <= 4
         |), expanded as (
         |  select vec_id as neighbor_id, cell, i - 1 as sub, codes[i] as code
         |  from (select vec_id, cell, codes,
         |          generate_subscripts(codes, 1) as i
         |        from coded) t
         |), contrib as (
         |  select p.query_id, e.neighbor_id, p.cdot_raw,
         |    list_dot_product(cb.centroid,
         |      p.embedding[e.sub * 8 + 1 : e.sub * 8 + 8]::double[]) as c
         |  from expanded e
         |  join probed p on p.cell = e.cell
         |  join cb on cb.sub = e.sub and cb.code = e.code
         |  where e.neighbor_id != p.query_id
         |), adc as (
         |  select query_id, neighbor_id,
         |    round(any_value(cdot_raw) + sum(c), 4) + 0.0 as adc_score
         |  from contrib group by query_id, neighbor_id
         |), shortlist as (
         |  select query_id, neighbor_id from (
         |    select query_id, neighbor_id,
         |      row_number() over (partition by query_id
         |        order by adc_score desc, neighbor_id) as srn
         |    from adc) t
         |  where srn <= 50
         |), pairs as (
         |  select s.query_id, s.neighbor_id, qe.embedding as qv,
         |    ne.embedding as nv
         |  from shortlist s
         |  join embeddings qe on qe.vec_id = s.query_id
         |  join embeddings ne on ne.vec_id = s.neighbor_id
         |), flat as (
         |  select query_id, neighbor_id,
         |    unnest(qv)::double as x, unnest(nv)::double as y
         |  from pairs
         |), dots as (
         |  select query_id, neighbor_id,
         |    sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
         |  from flat group by query_id, neighbor_id
         |), reranked as (
         |  select query_id, neighbor_id,
         |    round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as cosine
         |  from dots
         |)
         |select query_id, neighbor_id, cosine, rank from (
         |  select query_id, neighbor_id, cosine,
         |    row_number() over (partition by query_id
         |      order by cosine desc, neighbor_id) as rank
         |  from reranked) t
         |where rank <= 5
         |order by query_id, rank""".stripMargin),
    "similarity: IVF-PQ ANN — residual codebooks, cell-keyed probe join, q·c offset + ADC, staged index")
}
