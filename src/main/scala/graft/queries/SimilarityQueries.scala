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

  def all: Seq[Q] = Seq(e1, e2, e3, e7)
}
