package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Stage, Tables}

/** Similarity-search operators over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exact baseline, per-label
  * centroids, vector norms. The LSH-bucketed ANN scale path lives in
  * [[graft.ops.Similarity]] and is verified against the brute-force result
  * by ScalaTest (recall), since random-hyperplane bucketing is not
  * reasonably expressible in the DuckDB oracle.
  *
  * Dot products are computed in double (`zip_with` + `aggregate` — sequential
  * over the array, codegen-friendly, no UDF), and ranking happens on the
  * ROUNDED similarity with a deterministic id tie-break so Spark and DuckDB
  * order identically.
  */
object SimilarityQueries {

  /** Shadows `functions.round`: every rounded output column in this file is
    * zero-sign-normalized (see [[graft.Norm.rz]]); the oracle SQL mirrors
    * with `round(x, n) + 0.0`.
    */
  private def round(c: Column, n: Int): Column = graft.Norm.rz(c, n)

  /** dot(a, b) in double over two float arrays — the native codegen'd
    * [[graft.expressions.DotProduct]]; bit-identical to the zip_with +
    * aggregate spelling.
    */
  private def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct(a, b)

  private def norm2(a: Column): Column = dot(a, a)

  /** Brute-force cosine top-5 neighbors for the first 20 vectors. The query
    * side is tiny → broadcast; the candidate side streams. At scale this is
    * the exact-rerank stage after ANN candidate generation.
    */
  val e1 = Q(
    "e1_knn_brute",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          sqrt(norm2(col("embedding"))).as("qn"))
      val cands = emb
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          sqrt(norm2(col("embedding"))).as("cn"))
      val scored = cands.crossJoin(broadcast(queries))
        .filter(col("cid") =!= col("qid"))
        .select(
          col("qid"), col("cid"),
          round(
            dot(col("qe"), col("ce")) / nullif(col("qn") * col("cn"), lit(0.0)),
            4).as("cosine"))
      val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy("qid", "rn")
    },
    Some("""with pairs as (
      select q.vec_id as qid, c.vec_id as cid, q.embedding as qe, c.embedding as ce
      from embeddings q, embeddings c
      where q.vec_id < 20 and c.vec_id != q.vec_id
    ), flat as (
      select qid, cid,
        unnest(qe)::double as x, unnest(ce)::double as y
      from pairs
    ), dots as (
      select qid, cid, sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
      from flat group by qid, cid
    ), scored as (
      select qid, cid,
        round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as cosine
      from dots
    )
    select qid, cid, cosine, rn from (
      select qid, cid, cosine,
        row_number() over (partition by qid order by cosine desc, cid) as rn
      from scored) t
    where rn <= 5
    order by qid, rn"""),
    "similarity: brute-force cosine top-k (exact baseline)")

  /** Per-label centroids, one row per (label, dimension) — the relational
    * form of a vector mean, shuffled once on (label, pos).
    */
  val e2 = Q(
    "e2_label_centroids",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(round(avg(col("x").cast("double")), 6).as("centroid"))
        .select(col("label"), (col("pos") + 1).as("dim"), col("centroid"))
        .orderBy("label", "dim"),
    Some("""select label, i as dim,
      round(avg(x), 6) + 0.0 as centroid
    from (
      select label,
        unnest(embedding)::double as x,
        generate_subscripts(embedding, 1) as i
      from embeddings) t
    group by label, i
    order by label, dim"""),
    "similarity: per-label centroid vectors")

  /** Vector norms + summary stats per vector. */
  val e3 = Q(
    "e3_vector_norms",
    (s, dir) =>
      Tables.embeddings(s, dir)
        .select(
          col("vec_id"), col("label"),
          round(sqrt(norm2(col("embedding"))), 6).as("l2_norm"),
          round(
            aggregate(col("embedding"), lit(0.0),
              (acc, x) => acc + x.cast("double")) / size(col("embedding")),
            6).as("mean_component"),
          size(col("embedding")).as("dim"))
        .orderBy("vec_id"),
    Some("""select vec_id, label,
      round(sqrt(sum(x * x)), 6) + 0.0 as l2_norm,
      round(sum(x) / count(*), 6) + 0.0 as mean_component,
      cast(count(*) as int) as dim
    from (select vec_id, label, unnest(embedding)::double as x from embeddings) t
    group by vec_id, label
    order by vec_id"""),
    "similarity: vector norms and component stats")

  /** Int8 scalar quantization + quantized top-k — the memory-bound scale
    * path for embedding search: a 64-dim float vector is 256 B, its int8
    * form 64 B + one float scale, so a 100 TB embedding corpus scans 4×
    * less and holds 4× more of the index in executor memory. Per-vector
    * symmetric quantization (`scale = max|x| / 127`, `q_i = round(x_i /
    * scale)`) runs once in Spark and is STAGED; both engines then
    * dequantize and rank top-5 from the same staged bytes, so the entire
    * quantized scoring path is hash-verified. Integer products make the
    * dot exact; only the double scale multiplications round.
    */
  val e7 = Q(
    "e7_quantized_ann",
    (s, dir) => {
      val quantized = Stage.through(
        graft.ops.Similarity.quantizeInt8(
          Tables.embeddings(s, dir), "vec_id", "embedding"),
        dir, "e7_qvecs")
      graft.ops.Similarity.quantizedTopK(
        quantized, quantized.filter(col("vec_id") < 20), "vec_id", 5,
        c => round(c, 4))
        .select(col("query_id").as("qid"), col("neighbor_id").as("cid"),
          col("qcosine"), col("rank").as("rn"))
        .orderBy("qid", "rn")
    },
    Some(
      s"""with qv as (
         |  select vec_id, scale, qvec from ${Stage.sqlPath("e7_qvecs")}
         |), pairs as (
         |  select q.vec_id as qid, c.vec_id as cid, q.scale as qs,
         |    c.scale as cs, q.qvec as qv, c.qvec as cv
         |  from qv q, qv c
         |  where q.vec_id < 20 and c.vec_id != q.vec_id
         |), flat as (
         |  select qid, cid, qs, cs,
         |    unnest(qv)::bigint as a, unnest(cv)::bigint as b
         |  from pairs
         |), dots as (
         |  select qid, cid, any_value(qs) as qs, any_value(cs) as cs,
         |    sum(a * b) as dp, sum(a * a) as nq, sum(b * b) as nc
         |  from flat group by qid, cid
         |), scored as (
         |  select qid, cid,
         |    round((dp::double * qs * cs) /
         |      nullif(sqrt(nq::double) * qs * (sqrt(nc::double) * cs), 0),
         |      4) + 0.0 as qcosine
         |  from dots
         |)
         |select qid, cid, qcosine, rn from (
         |  select qid, cid, qcosine,
         |    row_number() over (partition by qid order by qcosine desc, cid) as rn
         |  from scored) t
         |where rn <= 5
         |order by qid, rn""".stripMargin),
    "similarity: int8 scalar quantization + quantized top-k (staged qvecs, hash-verified rerank)")

  /** Hybrid retrieval: BM25 keyword score over `documents` fused with
    * cosine similarity over the aligned `embeddings` row (doc i ↔ vec i)
    * by reciprocal-rank fusion — the retrieval stack of a modern RAG
    * pipeline as ONE declarative job. Scale shape: the term postings are
    * a 3-literal filter (tiny — broadcast-joined stats), the corpus is
    * touched once per modality, and fusion happens on two 50-row ranked
    * lists. Determinism discipline: every double score is ROUNDED before
    * ranking (id tie-breaks), and the RRF sum is two exact integer
    * reciprocals — so the fused ranking cannot flip on a cross-engine
    * ulp.
    */
  val e8 = Q(
    "e8_hybrid_search",
    (s, dir) => {
      val terms = Seq("spark", "join", "window")
      val k1 = 1.2
      val b = 0.75
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .select(col("doc_id"), col("t"), size(col("t")).as("len"))
      val stats = docs.agg(
        count(lit(1)).as("n_docs"),
        (sum("len") / count(lit(1))).as("avg_len"))
      val tf = docs
        .select(col("doc_id"), col("len"), explode(col("t")).as("token"))
        .filter(col("token").isInCollection(terms))
        .groupBy("doc_id", "len", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(countDistinct("doc_id").as("df"))
      val bm25 = tf
        .join(broadcast(df), Seq("token"))
        .crossJoin(broadcast(stats))
        .withColumn("idf",
          log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
        .withColumn("contrib",
          col("idf") * (col("tf") * (k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avg_len"))))
        .groupBy("doc_id")
        .agg(round(sum("contrib"), 4).as("bm25"))
        // Top-50 cut FIRST as TakeOrderedAndProject (per-partition top-k,
        // merge-of-k at the driver — no single-task sort of the scored
        // corpus), THEN boundedRank orders the 50 survivors (constant-key
        // window: same execution, no global-window WARN).
        .orderBy(col("bm25").desc, col("doc_id")).limit(50)
      val bm25Ranked = graft.ops.Ranks.boundedRank(bm25,
          Seq(col("bm25").desc, col("doc_id")), "rank_b")
        .select(col("doc_id").as("id"), col("bm25"), col("rank_b"))
      val emb = Tables.embeddings(s, dir)
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qe"), sqrt(norm2(col("embedding"))).as("qn"))
      val cosCut = emb.crossJoin(broadcast(qv))
        .select(col("vec_id"),
          round(dot(col("qe"), col("embedding")) /
            nullif(col("qn") * sqrt(norm2(col("embedding"))), lit(0.0)), 4)
            .as("cosine"))
        // Same top-k-before-rank shape as the BM25 leg.
        .orderBy(col("cosine").desc, col("vec_id")).limit(50)
      val cos = graft.ops.Ranks.boundedRank(cosCut,
          Seq(col("cosine").desc, col("vec_id")), "rank_v")
        .select(col("vec_id").as("id"), col("cosine"), col("rank_v"))
      val fused = bm25Ranked.join(cos, Seq("id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("rank_b")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("rank_v")), lit(0.0)), 6))
        // Fused list is ≤100 rows (two top-50s), but keep the same
        // cut-then-rank discipline so no window ever sees more than k rows.
        .orderBy(col("rrf").desc, col("id")).limit(20)
      graft.ops.Ranks.boundedRank(fused,
          Seq(col("rrf").desc, col("id")), "rank")
        .select(col("id"), col("bm25"), col("cosine"), col("rrf"), col("rank"))
        .orderBy("rank")
    },
    Some("""with docs as (
      select doc_id, string_split(text, ' ') as t,
        len(string_split(text, ' ')) as len
      from documents
    ), stats as (
      select count(*) as n_docs, sum(len) / count(*) as avg_len from docs
    ), tf as (
      select doc_id, len, token, count(*) as tf
      from (select doc_id, len, unnest(t) as token from docs) x
      where token in ('spark', 'join', 'window')
      group by 1, 2, 3
    ), dfs as (
      select token, count(distinct doc_id) as df from tf group by 1
    ), bm25 as (
      select doc_id,
        round(sum(
          ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * len / avg_len))),
          4) + 0.0 as bm25
      from tf join dfs using (token) cross join stats
      group by doc_id
    ), blist as (
      select doc_id as id, bm25,
        cast(row_number() over (order by bm25 desc, doc_id) as int) as rank_b
      from bm25 qualify rank_b <= 50
    ), qv as (
      select embedding as qe from embeddings where vec_id = 0
    ), flat as (
      select vec_id, unnest(embedding)::double as y,
        unnest(qe)::double as x
      from embeddings cross join qv
    ), dots as (
      select vec_id, sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
      from flat group by vec_id
    ), clist as (
      select vec_id as id,
        round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as cosine,
        cast(row_number() over (
          order by round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 desc,
            vec_id) as int) as rank_v
      from dots qualify rank_v <= 50
    )
    , fused as (
      select coalesce(b.id, c.id) as id, b.bm25, c.cosine,
        round(coalesce(1.0 / (60 + b.rank_b), 0.0)
          + coalesce(1.0 / (60 + c.rank_v), 0.0), 6) + 0.0 as rrf
      from blist b full outer join clist c on b.id = c.id
    )
    select id, bm25, cosine, rrf,
      cast(row_number() over (order by rrf desc, id) as int) as rank
    from fused
    qualify rank <= 20
    order by rank"""),
    "hybrid retrieval: BM25 + vector cosine fused by reciprocal rank (round-before-rank discipline)")

  /** Hard-negative mining for contrastive training: for each query vector,
    * the most-similar corpus vector sharing its label (the positive) and
    * the most-similar one with a DIFFERENT label (the hard negative), plus
    * the margin between them — the triplets an embedding-training pipeline
    * feeds to a triplet/InfoNCE loss. Same broadcast-queries ×
    * streamed-corpus topology as [[e1]] (at 100 TB the candidate side
    * would be ANN candidates from e5/e6 instead of the full corpus);
    * ranking happens on the ROUNDED cosine with id tie-breaks, and the
    * margin subtracts the two already-rounded doubles, so both engines do
    * identical IEEE arithmetic on identical inputs.
    */
  val e9 = Q(
    "e9_hard_negatives",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 50)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("label").as("ql"), sqrt(norm2(col("embedding"))).as("qn"))
      val cands = emb
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("label").as("cl"), sqrt(norm2(col("embedding"))).as("cn"))
      val scored = cands.crossJoin(broadcast(queries))
        .filter(col("cid") =!= col("query_id"))
        .select(col("query_id"), col("cid"),
          (col("cl") === col("ql")).as("same"),
          round(
            dot(col("qe"), col("ce")) / nullif(col("qn") * col("cn"), lit(0.0)),
            4).as("cos"))
      val w = Window.partitionBy("query_id", "same")
        .orderBy(col("cos").desc, col("cid"))
      val best = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      val pos = best.filter(col("same"))
        .select(col("query_id"), col("cid").as("pos_id"),
          col("cos").as("pos_cos"))
      val neg = best.filter(!col("same"))
        .select(col("query_id"), col("cid").as("neg_id"),
          col("cos").as("neg_cos"))
      pos.join(neg, Seq("query_id"))
        .select(col("query_id"), col("pos_id"), col("pos_cos"),
          col("neg_id"), col("neg_cos"),
          round(col("pos_cos") - col("neg_cos"), 4).as("margin"))
        .orderBy("query_id")
    },
    Some("""with q as (
      select vec_id as query_id, embedding as qe, label as ql
      from embeddings where vec_id < 50
    ), pairs as (
      select q.query_id, c.vec_id as cid, (c.label = q.ql) as same,
        q.qe as qe, c.embedding as ce
      from q join embeddings c on c.vec_id <> q.query_id
    ), flat as (
      select query_id, cid, same,
        unnest(qe)::double as x, unnest(ce)::double as y
      from pairs
    ), dots as (
      select query_id, cid, same,
        sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
      from flat group by query_id, cid, same
    ), scored as (
      select query_id, cid, same,
        round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as cos
      from dots
    ), best as (
      select query_id, cid, same, cos from (
        select query_id, cid, same, cos,
          row_number() over (partition by query_id, same
            order by cos desc, cid) as rn
        from scored) t
      where rn = 1
    )
    select p.query_id, p.cid as pos_id, p.cos as pos_cos,
      n.cid as neg_id, n.cos as neg_cos,
      round(p.cos - n.cos, 4) + 0.0 as margin
    from best p join best n on n.query_id = p.query_id
    where p.same and not n.same
    order by p.query_id"""),
    "similarity: hard-negative mining (nearest same-label + nearest cross-label + margin)")

  /** Generated oracle for [[e13]]: the greedy MMR recurrence unrolled into
    * one chained CTE per step (same unroll discipline as t37's merge
    * cascade) — DuckDB recomputes the candidate cut, the pairwise cosines
    * AND all 8 greedy selections from the raw embeddings; nothing is staged.
    * The multi-referenced CTEs are MATERIALIZED: each step references the
    * previous selection set three times, so inlined CTEs would re-evaluate
    * the whole chain 3^7 times.
    */
  private val e13Oracle: String = {
    val steps = (2 to 8).map { i =>
      s""", sel$i as materialized (
    select qid, $i as step, cid, rel, maxsim from (
      select c.qid, c.cid, c.rel, m.maxsim,
        row_number() over (partition by c.qid
          order by 0.5 * c.rel - 0.5 * m.maxsim desc, c.cid) as rn
      from cands c
      join (select p.qid, p.a as cid, max(p.sim) as maxsim
            from prs p join selall${i - 1} s on s.qid = p.qid and s.cid = p.b
            group by p.qid, p.a) m
        on m.qid = c.qid and m.cid = c.cid
      left join selall${i - 1} x on x.qid = c.qid and x.cid = c.cid
      where x.cid is null) t
    where rn = 1
  ), selall$i as materialized (
    select * from selall${i - 1} union all select * from sel$i
  )"""
    }.mkString
    s"""with q as (
      select vec_id as qid, embedding as qe from embeddings where vec_id < 8
    ), c as (
      select vec_id as cid, embedding as ce from embeddings
    ), scored0 as (
      select qid, cid, round(dp / nullif(sqrt(nq) * sqrt(nc), 0), 4) + 0.0 as rel
      from (
        select qid, cid, sum(x * y) as dp, sum(x * x) as nq, sum(y * y) as nc
        from (select qid, cid, unnest(qe)::double as x, unnest(ce)::double as y
              from (select qid, cid, qe, ce from q, c where cid != qid) p) f
        group by qid, cid) d
    ), cands as materialized (
      select qid, cid, rel from (
        select qid, cid, rel,
          row_number() over (partition by qid order by rel desc, cid) as rn
        from scored0) t
      where rn <= 20
    ), candv as (
      select cands.qid, cands.cid, c.ce from cands join c on c.cid = cands.cid
    ), prs as materialized (
      select qid, a, b, round(dp / nullif(sqrt(na) * sqrt(nb), 0), 4) + 0.0 as sim
      from (
        select qid, a, b, sum(x * y) as dp, sum(x * x) as na, sum(y * y) as nb
        from (select p.qid, p.a, p.b,
                unnest(p.ea)::double as x, unnest(p.eb)::double as y
              from (select x1.qid, x1.cid as a, x2.cid as b,
                      x1.ce as ea, x2.ce as eb
                    from candv x1 join candv x2
                      on x1.qid = x2.qid and x1.cid != x2.cid) p) f
        group by qid, a, b) d
    ), selall1 as materialized (
      select qid, 1 as step, cid, rel, 0.0 as maxsim from (
        select qid, cid, rel,
          row_number() over (partition by qid order by rel desc, cid) as rn
        from cands) t
      where rn = 1
    )$steps
    select qid, step, cid, rel,
      round(maxsim, 4) + 0.0 as max_sel_sim,
      round(0.5 * rel - 0.5 * maxsim, 5) + 0.0 as mmr_score
    from selall8
    order by qid, step"""
  }

  /** MMR diversity re-ranking (λ=0.5, k=8 from top-20 cosine candidates) —
    * the post-retrieval diversification step of RAG/context-assembly
    * pipelines. Scale shape: candidate generation is the distributed ANN
    * work (here the e1 broadcast-queries brute cut; at 100 TB the IVF/PQ
    * paths of [[graft.ops.Similarity]]); the greedy loop touches only each
    * query's own ≤20 candidates via the typed [[graft.ops.Mmr]] kernel —
    * one shuffle on qid, no corpus-global step, work bounded by
    * queries × candidates². Both `rel` and `sim` are rounded to 4 digits
    * BEFORE the greedy so Spark and the oracle compare identical doubles;
    * λ=0.5 keeps both MMR terms exact IEEE halvings.
    */
  val e13 = Q(
    "e13_mmr_rerank",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          sqrt(norm2(col("embedding"))).as("qn"))
      val cands = emb
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          sqrt(norm2(col("embedding"))).as("cn"))
      val scored = cands.crossJoin(broadcast(queries))
        .filter(col("cid") =!= col("qid"))
        .select(col("qid"), col("cid"), col("ce"), col("cn"),
          round(
            dot(col("qe"), col("ce")) / nullif(col("qn") * col("cn"), lit(0.0)),
            4).as("rel"))
      val w = Window.partitionBy("qid").orderBy(col("rel").desc, col("cid"))
      val top = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select("qid", "cid", "ce", "cn", "rel")
      val a = top.select(col("qid"), col("cid").as("a"), col("rel"),
        col("ce").as("ea"), col("cn").as("na"))
      val b = top.select(col("qid").as("qid_b"), col("cid").as("b"),
        col("ce").as("eb"), col("cn").as("nb"))
      val pairs = a
        .join(b, col("qid") === col("qid_b") && col("a") =!= col("b"))
        .select(col("qid"), col("a"), col("rel"), col("b"),
          round(
            dot(col("ea"), col("eb")) / nullif(col("na") * col("nb"), lit(0.0)),
            4).as("sim"))
      graft.ops.Mmr.rerank(pairs, 8)
        .select(col("qid"), col("step"), col("cid"), col("rel"),
          round(col("max_sel_sim"), 4).as("max_sel_sim"),
          // 5 digits, NOT 4: both MMR terms are exact halvings of 4-digit
          // values, so the score lands ON the 5-decimal grid (multiples of
          // 0.00005) — mid-cell for round(·,5) on both engines. Rounding at
          // 4 would sit exactly on the .00005 boundary whenever rel−maxsim
          // has an odd last digit, where Spark's BigDecimal HALF_UP and
          // DuckDB's scaled rint can disagree (bit at sf0.1, row 43).
          round(col("mmr_score"), 5).as("mmr_score"))
        .orderBy("qid", "step")
    },
    Some(e13Oracle),
    "similarity: MMR diversity re-rank (λ=0.5, k=8) of top-20 cosine candidates")

  /** Binary (1-bit sign) quantization + Hamming top-k — the third
    * quantization family next to int8 ([[e7]]) and product quantization
    * (`e12_pq_ann`), and the most compressed: a 64-dim float vector (256 B)
    * becomes TWO longs (16 B), a 16× scan reduction, so a 100 TB float
    * corpus binarizes to ~6 TB and the whole index fits executor memory at
    * cluster scale. The distance kernel is `bit_count(a XOR b)` over the
    * packed words — three codegen'd integer builtins per word pair, no
    * arrays, no floats, the cheapest candidate-generation scan any index
    * family here offers (at scale this is the coarse filter in front of an
    * exact float rerank, exactly like e5/e6's bucket → rerank shape).
    * Determinism: Hamming is integer-exact — no rounding discipline needed
    * anywhere; ties break on cid. Plan shape: one projection pass packs the
    * corpus, queries broadcast, per-qid top-5 via a PARTITIONED rank window.
    */
  val e14 = Q(
    "e14_binary_ann",
    (s, dir) => {
      val words = graft.ops.Similarity.signPack(
        Tables.embeddings(s, dir), "vec_id", "embedding")
      graft.ops.Similarity.binaryTopK(
          words, words.filter(col("vec_id") < 16), "vec_id", 5)
        .orderBy("qid", "rn")
    },
    Some("""with flat as (
      select vec_id, unnest(embedding) as x,
             generate_subscripts(embedding, 1) - 1 as i
      from embeddings
    ), words as (
      select vec_id,
        sum(case when i < 32 and x > 0 then (1::bigint << i) else 0 end)::bigint as w0,
        sum(case when i >= 32 and x > 0 then (1::bigint << (i - 32)) else 0 end)::bigint as w1
      from flat group by vec_id
    ), pairs as (
      select q.vec_id as qid, c.vec_id as cid,
        cast(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1)) as int) as hamming
      from words q join words c on q.vec_id < 16 and c.vec_id != q.vec_id
    ), ranked as (
      select qid, cid, hamming,
        row_number() over (partition by qid order by hamming, cid) as rn
      from pairs
    )
    select qid, cid, hamming, rn from ranked where rn <= 5 order by qid, rn"""),
    "similarity: binary sign quantization + Hamming top-k (bit_count(xor) kernel, 16x compression)")

  /** Generated oracle for [[e15]]: 12 power-iteration matvecs unrolled into
    * chained CTEs (the e13/t37 unroll discipline). DuckDB recomputes the
    * covariance matrix, the full iteration, the Rayleigh quotient and the
    * per-label projection stats from the raw embeddings — nothing staged.
    * Parity discipline: the covariance entries are rounded to 6 digits on
    * BOTH sides before iterating (identical matrices), the iteration runs
    * UN-normalized (pure matvecs — double relative error stays ~1e-14 over
    * 12 steps regardless of magnitude), and every output rounds at 6.
    */
  private val e15Oracle: String = {
    val steps = (0 until 12).map { k =>
      s""", v${k + 1} as materialized (
      select c.i, sum(c.c * v.v) as v
      from cov c join v$k v on v.i = c.j group by c.i
    )"""
    }.mkString
    s"""with flat as (
      select vec_id, label, unnest(embedding)::double as x,
             generate_subscripts(embedding, 1) - 1 as i
      from embeddings
    ), nrows as (
      select count(*)::double as n from embeddings
    ), mu as (
      select i, avg(x) as m from flat group by i
    ), sxy as (
      select a.i as i, b.i as j, sum(a.x * b.x) as s
      from flat a join flat b on a.vec_id = b.vec_id
      group by a.i, b.i
    ), cov as materialized (
      select s.i, s.j,
        round((s.s - n.n * mi.m * mj.m) / (n.n - 1), 6) + 0.0 as c
      from sxy s, nrows n
      join mu mi on mi.i = s.i
      join mu mj on mj.i = s.j
    ), v0 as (
      select i, 1.0 as v from mu
    )$steps, vn as materialized (
      select i, v / sqrt((select sum(v * v) from v12)) as v from v12
    ), scalars as (
      select
        (select sum(c.c * a.v * b.v) from cov c
          join vn a on a.i = c.i join vn b on b.i = c.j) as lambda1,
        (select sum(c) from cov where i = j) as trace
    ), proj as (
      select f.vec_id, f.label, sum((f.x - mu.m) * vn.v) as p
      from flat f join mu on mu.i = f.i join vn on vn.i = f.i
      group by f.vec_id, f.label
    )
    select label, count(*) as n_vecs,
      round(avg(p), 6) + 0.0 as mean_proj,
      round(stddev_samp(p), 6) + 0.0 as sd_proj,
      round((select lambda1 from scalars), 6) + 0.0 as lambda1,
      round((select lambda1 from scalars) / (select trace from scalars), 6)
        + 0.0 as explained_ratio
    from proj
    group by label
    order by label"""
  }

  /** Top-principal-component corpus diagnostics — the spectral health check
    * a curation pipeline runs before clustering/ANN index choice: the
    * dominant eigenvalue's explained-variance ratio says whether the
    * embedding space is near-isotropic (healthy) or collapsed onto a few
    * directions, and per-label projection stats on PC1 show label
    * separation. Scale shape: the d×d second-moment matrix is built with
    * CHAINED GENERATORS (two posexplodes from the same row — no self-join,
    * no pre-shuffle), so the N·d² generated rows reduce map-side to ≤d²
    * partials per partition and one tiny keyed shuffle; the driver then
    * holds exactly d² = 4096 scalars for the 12 power-iteration matvecs —
    * the same sanctioned driver-scale as the IVF centroid collect
    * (`ops/Similarity.scala`) — and the PC1 projection redistributes as a
    * broadcast join + per-row fused multiply-add. N never leaves the
    * cluster; only d² does.
    */
  val e15 = Q(
    "e15_pca_power",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val flat = emb.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("label"), col("i"),
          col("xf").cast("double").as("x"))
      val prods = emb
        .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xi")))
        .select(col("i"), col("xi").cast("double").as("xi"),
          posexplode(col("embedding")).as(Seq("j", "xj")))
        .select(col("i"), col("j"),
          (col("xi") * col("xj").cast("double")).as("xy"))
      val sxy = prods.groupBy("i", "j").agg(sum("xy").as("s"))
      val mu = flat.groupBy("i").agg(avg("x").as("m"))
      val nDf = emb.agg(count(lit(1)).cast("double").as("n"))
      val cov = sxy
        .join(broadcast(mu.select(col("i"), col("m").as("mi"))), "i")
        .join(broadcast(mu.select(col("i").as("j"), col("m").as("mj"))), "j")
        .crossJoin(broadcast(nDf))
        .select(col("i"), col("j"),
          round((col("s") - col("n") * col("mi") * col("mj")) /
            (col("n") - 1), 6).as("c"))
      // d² scalars to the driver (IVF-centroid precedent), matvecs local.
      val entries = cov.collect()
        .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      val dim = entries.keys.map(_._1).max + 1
      val c = Array.tabulate(dim, dim)((i, j) => entries((i, j)))
      var v = Array.fill(dim)(1.0)
      for (_ <- 0 until 12) {
        val next = Array.tabulate(dim) { i =>
          var acc = 0.0
          var j = 0
          while (j < dim) { acc += c(i)(j) * v(j); j += 1 }
          acc
        }
        v = next
      }
      val nrm = math.sqrt(v.map(x => x * x).sum)
      val vh = v.map(_ / nrm)
      var lam = 0.0
      for (i <- 0 until dim; j <- 0 until dim) lam += c(i)(j) * vh(i) * vh(j)
      val trace = (0 until dim).map(i => c(i)(i)).sum
      val vDf = s.createDataFrame(
        s.sparkContext.parallelize(vh.toIndexedSeq.zipWithIndex
          .map { case (x, i) => org.apache.spark.sql.Row(i, x) }, 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("i",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.DoubleType))))
      val proj = flat
        .join(broadcast(mu), "i")
        .join(broadcast(vDf), "i")
        .groupBy("vec_id", "label")
        .agg(sum((col("x") - col("m")) * col("v")).as("p"))
      proj.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg("p"), 6).as("mean_proj"),
          round(stddev_samp(col("p")), 6).as("sd_proj"))
        .select(col("label"), col("n_vecs"), col("mean_proj"), col("sd_proj"),
          round(lit(lam), 6).as("lambda1"),
          round(lit(lam / trace), 6).as("explained_ratio"))
        .orderBy("label")
    },
    Some(e15Oracle),
    "similarity: PC1 via distributed covariance + power iteration (spectral corpus diagnostics)")

  def all: Seq[Q] = Seq(e1, e2, e3, e7, e8, e9, e13, e14, e15)
}
