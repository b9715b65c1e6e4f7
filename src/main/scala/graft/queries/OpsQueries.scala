package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Stage, Tables}
import graft.ingest.Ingest
import graft.ops.{Components, Dedup, Multimodal, Similarity}
import graft.sleep.SleepModels

/** North-star / scale-path operators surfaced through the driver contract.
  *
  * The non-SQL-expressible stages (LSH bucketing, binary EDF parsing +
  * signal kernels, synthetic media generation) run once in Spark and are
  * STAGED to parquet ([[graft.Stage]]); everything downstream of the staged
  * intermediate — exact Jaccard/cosine rerank, ranking, the whole sleep
  * model DAG, metadata rollups — is recomputed independently by the DuckDB
  * oracle from the same staged bytes and hash-compared. The staged stages
  * themselves are verified by ScalaTest against exact baselines
  * (DedupSpec / SimilaritySpec / IngestSpec: recall vs exact Jaccard /
  * brute-force top-k, closed-form signal fixtures).
  */
object OpsQueries {

  /** Full signal path: synthetic EDF recordings → binary parse → epoch →
    * Welch PSD → band power → model DAG → summary mart. Deterministic
    * (seeded); the signal source is the engine's own (reference S1-S3 have
    * no testdata analog). Extracted epochs are staged to parquet — the
    * materialize-epochs-then-model shape of the real pipeline — and the
    * oracle runs the SAME staging → metrics → summary SQL chain (reference
    * gap of 120 epochs) over the staged file, so the model DAG is
    * hash-verified end to end; the signal kernels stay spec-verified
    * (IngestSpec / SignalSpec).
    */
  val ingest = Q(
    "ingest_sleep_summary",
    (s, dir) => {
      val epochs = Stage.through(
        Ingest.epochsOf(Ingest.extractSynthetic(s, 2)), dir, "ingest_epochs")
      SleepQueries.summaryProjection(
        SleepModels.sleepSummary(
          SleepModels.sleepMetrics(SleepModels.staging(epochs))))
    },
    Some(
      s"""with epochs as (
         |  select subject_id, epoch_idx, stage, delta_power, theta_power,
         |         alpha_power, sigma_power, beta_power
         |  from ${Stage.sqlPath("ingest_epochs")}
         |),
         |${SleepQueries.stagingSql},
         |${SleepQueries.metricsSql(SleepModels.DefaultGapEpochs)},
         |${SleepQueries.summarySql}""".stripMargin),
    "S1/S2/N1-N6: EDF parse → Welch → band power → marts (DAG hash-verified over staged epochs)")

  /** MinHash-LSH near-dup on documents — the scale path for t6's exact
    * Jaccard. Candidate (d1, d2) pairs come from the banded signature join
    * (skew-capped by default, recall verified in DedupSpec) and are staged;
    * both engines then rerank the SAME candidates with exact shingle
    * Jaccard and threshold at 0.3, so the verify stage is hash-checked.
    */
  val lshNearDup = Q(
    "d1_lsh_neardup",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // One shingle pass feeds both LSH candidate generation and the exact
      // rerank; persist() so the explode+hash runs once per execution.
      val sh = Dedup.shingles(docs, "text", 5).persist()
      val cands = Stage.through(Dedup.candidatePairsFromShingles(sh), dir, "d1_pairs")
      Dedup.rerankJaccardOnShingles(cands, sh)
        .select(col("d1"), col("d2"),
          graft.Norm.rz(col("jaccard"), 6).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
        .orderBy(col("jaccard").desc, col("d1"), col("d2"))
    },
    Some(
      s"""with cand as (select d1, d2 from ${Stage.sqlPath("d1_pairs")}),
         |toks as (
         |  select doc_id, string_split(text, ' ') as t from documents
         |), sub as (
         |  select doc_id, t, generate_subscripts(t, 1) as i from toks
         |), sh as (
         |  select distinct doc_id, array_to_string(t[i:i+4], ' ') as shingle
         |  from sub where i <= greatest(len(t) - 5, 0) + 1
         |), sizes as (
         |  select doc_id, count(*) as n_shingles from sh group by doc_id
         |), inter as (
         |  select c.d1, c.d2, count(*) as inter
         |  from cand c
         |  join sh a on a.doc_id = c.d1
         |  join sh b on b.doc_id = c.d2 and b.shingle = a.shingle
         |  group by 1, 2
         |)
         |select i.d1, i.d2,
         |  round(cast(inter as double) / (s1.n_shingles + s2.n_shingles - inter), 6) + 0.0 as jaccard
         |from inter i
         |join sizes s1 on i.d1 = s1.doc_id
         |join sizes s2 on i.d2 = s2.doc_id
         |where round(cast(inter as double) / (s1.n_shingles + s2.n_shingles - inter), 6) >= 0.3
         |order by jaccard desc, d1, d2""".stripMargin),
    "dedup-minhash-lsh: banded candidates (staged) + hash-verified exact rerank")

  /** DuckDB mirror of [[Dedup.cappedPairJoin]] — the banded→marked→cand
    * CTE chain (bucket-size window, star-cap skew guard, candidate
    * self-join) shared verbatim by the d2/m5/m6/m7 oracles, so the
    * skew-cap semantics live in ONE SQL spelling: if the Spark-side cap
    * ever changes, one helper changes with it instead of four strings
    * drifting independently. `bandedSelect` must yield
    * `($idCol, band, bucket)`; callers interpolate the result after
    * `with ` and close with their verify CTEs. No stripMargin inside —
    * the caller's stripMargin handles the `|` margins.
    */
  private def candSqlCtes(bandedSelect: String, idCol: String): String =
    s"""banded as (
       |  $bandedSelect
       |), marked as (
       |  select $idCol, band, bucket,
       |    count(*) over (partition by band, bucket) as bsize,
       |    min($idCol) over (partition by band, bucket) as bmin
       |  from banded
       |), cand as (
       |  select distinct d1, d2 from (
       |    select a.$idCol as d1, b.$idCol as d2
       |    from marked a
       |    join marked b on a.band = b.band and a.bucket = b.bucket
       |      and a.$idCol < b.$idCol
       |    where a.bsize <= ${Dedup.DefaultMaxBucketSize}
       |    union all
       |    select bmin, $idCol
       |    from marked
       |    where bsize > ${Dedup.DefaultMaxBucketSize} and $idCol <> bmin)
       |)"""

  /** The 64-bit-fingerprint banded select over a staged `sigs` CTE —
    * d2/m5/m6's shared `bandedSelect` argument for [[candSqlCtes]].
    */
  private val SimhashBandedSelect: String =
    "select s.doc_id, g.band, (s.simhash >> (g.band * 16)) & 65535 " +
      "as bucket from sigs s cross join range(4) g(band)"

  /** SimHash near-dup on documents — the bit-fingerprint alternative to
    * d1's MinHash. ONLY the 64-bit signatures (xxhash64 token bits,
    * majority vote — not DuckDB-reproducible) are staged; everything
    * downstream — chunk banding (`shiftright & mask` is plain integer
    * arithmetic, identical in both engines), the bucket-size/star-cap skew
    * guard, the candidate self-join, AND the Hamming verify
    * (`bit_count(xor)`) at ≤3 — is recomputed independently by the oracle
    * from the same staged bytes. One staged write + one final action
    * (round-3 shape chained a second staged write for the pairs: one more
    * write job + read-back for a WEAKER oracle). Candidate recall
    * (pigeonhole at distance ≤ bands-1) is spec-verified in
    * SimhashDedupSpec.
    */
  val simhashNearDup = Q(
    "d2_simhash_neardup",
    (s, dir) => {
      val sigs = Stage.through(
        Dedup.simhash64(Tables.documents(s, dir)), dir, "d2_sigs")
      Dedup.hammingPairs(Dedup.simhashCandidatePairs(sigs), sigs)
        .filter(col("hamming") <= 3)
        .orderBy(col("hamming"), col("d1"), col("d2"))
    },
    Some(
      s"""with sigs as (
         |  select doc_id, simhash from ${Stage.sqlPath("d2_sigs")}
         |), ${candSqlCtes(SimhashBandedSelect, "doc_id")}
         |select c.d1, c.d2,
         |  cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
         |from cand c
         |join sigs a on a.doc_id = c.d1
         |join sigs b on b.doc_id = c.d2
         |where bit_count(xor(a.simhash, b.simhash)) <= 3
         |order by hamming, d1, d2""".stripMargin),
    "dedup-simhash: staged fingerprints; banding + skew cap + Hamming verify all hash-verified")

  /** Near-dup CLUSTERS: d1's pipeline produces verified pairs (exact
    * Jaccard ≥ 0.3 over LSH candidates), then min-label propagation
    * ([[Components.connectedComponents]]) folds the pairs into transitive
    * groups — the step that picks one canonical document per duplicate
    * family. The thresholded pairs are staged; DuckDB recomputes the
    * transitive closure independently with a recursive CTE, so the
    * clustering itself is hash-verified, not just the pairs.
    */
  val dedupClusters = Q(
    "d3_dedup_clusters",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val sh = Dedup.shingles(docs, "text", 5).persist()
      val pairs = Dedup.rerankJaccardOnShingles(
          Dedup.candidatePairsFromShingles(sh), sh)
        .filter(col("jaccard") >= 0.3)
        .select("d1", "d2")
      val staged = Stage.through(pairs, dir, "d3_pairs")
      val comps = Components.connectedComponents(staged)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      comps
        .withColumn("cluster_size", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
        .orderBy("cluster_id", "doc_id")
    },
    Some(
      s"""with recursive sym as (
         |  select d1 as a, d2 as b from ${Stage.sqlPath("d3_pairs")}
         |  union
         |  select d2, d1 from ${Stage.sqlPath("d3_pairs")}
         |), reach(a, b) as (
         |  select a, b from sym
         |  union
         |  select r.a, s.b from reach r join sym s on r.b = s.a
         |), lbl as (
         |  select a as doc_id, least(a, min(b)) as cluster_id
         |  from reach group by a
         |)
         |select doc_id, cluster_id,
         |  count(*) over (partition by cluster_id) as cluster_size
         |from lbl
         |order by cluster_id, doc_id""".stripMargin),
    "dedup clusters: connected components over verified near-dup pairs (recursive-CTE oracle)")

  /** Canonical-document selection — the step a real dedup pipeline runs
    * AFTER clustering: every document gets its duplicate-cluster id
    * (singletons are their own cluster) and a keep/drop verdict, keep =
    * lowest doc_id in the cluster. The output is the complete corpus
    * keep-list a training-data run would feed downstream. Same staged-pairs
    * + recursive-CTE verification shape as d3, extended through the
    * left-join + arg-min selection, so the WHOLE path — clustering included
    * — is hash-verified end to end.
    */
  val canonicalDocs = Q(
    "d4_canonical_docs",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val sh = Dedup.shingles(docs, "text", 5).persist()
      val pairs = Dedup.rerankJaccardOnShingles(
          Dedup.candidatePairsFromShingles(sh), sh)
        .filter(col("jaccard") >= 0.3)
        .select("d1", "d2")
      val staged = Stage.through(pairs, dir, "d4_pairs")
      val comps = Components.connectedComponents(staged)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      docs.select(col("doc_id"))
        .join(comps, Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
        .withColumn("keep",
          col("doc_id") === min("doc_id").over(
            org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
        .orderBy("doc_id")
    },
    Some(
      s"""with recursive sym as (
         |  select d1 as a, d2 as b from ${Stage.sqlPath("d4_pairs")}
         |  union
         |  select d2, d1 from ${Stage.sqlPath("d4_pairs")}
         |), reach(a, b) as (
         |  select a, b from sym
         |  union
         |  select r.a, s.b from reach r join sym s on r.b = s.a
         |), lbl as (
         |  select a as doc_id, least(a, min(b)) as cluster_id
         |  from reach group by a
         |), labeled as (
         |  select d.doc_id, coalesce(l.cluster_id, d.doc_id) as cluster_id
         |  from documents d left join lbl l on d.doc_id = l.doc_id
         |)
         |select doc_id, cluster_id,
         |  doc_id = min(doc_id) over (partition by cluster_id) as keep
         |from labeled
         |order by doc_id""".stripMargin),
    "dedup canonical selection: per-cluster arg-min keep/drop list over the full corpus")

  /** Incremental-ingest dedup: which documents of a new batch (hash
    * buckets ≥ 80) are genuinely new against the already-ingested corpus
    * (buckets < 80)? Runs [[Dedup.incrementalNew]]: a distributed-built
    * Bloom sketch of the corpus keys probed map-side, with only the
    * bloom-positive sliver paying the exact anti-join verify — the shape
    * that keeps per-batch cost O(|batch|) instead of O(|batch| ⋈ |corpus|)
    * on a 100 TB corpus. The sketch is pure prefilter (no false
    * negatives + exact verify of positives), so the result is
    * byte-identical to the plain anti join the oracle runs.
    */
  val bloomIncremental = Q(
    "d5_bloom_incremental",
    (s, dir) => {
      val bucket = (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100)
      val docs = Tables.documents(s, dir)
        .withColumn("bucket", bucket)
        .withColumn("h", md5(col("text")))
      val corpus = docs.filter(col("bucket") < 80).select("h")
      val batch = docs.filter(col("bucket") >= 80).select("doc_id", "h")
      Dedup.incrementalNew(corpus, batch, "h", expectedItems = corpus.count())
        .select(col("doc_id"), col("h").as("text_hash"))
        .orderBy("doc_id")
    },
    Some("""with b as (
      select doc_id, text,
        cast(concat('0x', substr(md5(cast(doc_id as varchar)), 1, 6)) as bigint) % 100 as bucket
      from documents
    )
    select n.doc_id, md5(n.text) as text_hash
    from b n
    where n.bucket >= 80
      and not exists (
        select 1 from b c where c.bucket < 80 and md5(c.text) = md5(n.text))
    order by doc_id"""),
    "incremental dedup: bloom-sketch prefilter + exact verify of the positive sliver")

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

  /** Multimodal metadata rollup: the synthetic media table's typed metadata
    * (payload length computed Spark-side from the binary column) is staged,
    * then both engines aggregate it — the relational face of the multimodal
    * table is hash-verified; decode plumbing stays spec-verified
    * (MultimodalSpec).
    */
  val mediaStats = Q(
    "m1_media_stats",
    (s, dir) => {
      val meta = Multimodal.syntheticMedia(s, 300).toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          col("width"), col("height"), col("sample_rate"), col("n_frames"))
      Stage.through(meta, dir, "m1_media_meta")
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_items"),
          sum("n_bytes").as("total_bytes"),
          graft.Norm.rz(avg("n_bytes"), 6).as("avg_bytes"),
          max("width").as("max_width"),
          max("n_frames").as("max_frames"))
        .orderBy("kind")
    },
    Some(
      s"""select kind,
         |  count(*) as n_items,
         |  cast(sum(n_bytes) as bigint) as total_bytes,
         |  round(avg(n_bytes), 6) + 0.0 as avg_bytes,
         |  max(width) as max_width,
         |  max(n_frames) as max_frames
         |from ${Stage.sqlPath("m1_media_meta")}
         |group by kind
         |order by kind""".stripMargin),
    "multimodal: binary-column metadata rollup (staged metadata, hash-verified)")

  /** Decode-in-the-loop image features: the synthetic media table's image
    * payloads run through the REAL decode path ([[Multimodal.imageFeatures]]
    * — `javax.imageio` for container formats, raw-raster fallback for the
    * synthetic payloads) inside typed `mapPartitions`; the per-image
    * features (decoded dims, mean luma, 16-bin histogram) are staged, and
    * both engines independently roll them up into intensity bands — so the
    * decode plumbing is exercised in the query path, not just in specs, and
    * everything downstream of the codec is hash-verified.
    */
  val imageFeatures = Q(
    "m2_image_features",
    (s, dir) => {
      val feats = Multimodal.imageFeatures(Multimodal.syntheticMedia(s, 300))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          graft.Norm.rz(col("mean_intensity"), 6).as("mean_intensity"),
          col("intensity_histogram"))
      Stage.through(feats, dir, "m2_image_feats")
        .groupBy(floor(col("mean_intensity") / 16).cast("int")
          .as("intensity_band"))
        .agg(
          count(lit(1)).as("n_images"),
          graft.Norm.rz(avg("mean_intensity"), 6).as("avg_intensity"),
          sum(element_at(col("intensity_histogram"), 1)).as("dark_pixels"),
          sum(element_at(col("intensity_histogram"), 16)).as("bright_pixels"))
        .orderBy("intensity_band")
    },
    Some(
      s"""select cast(floor(mean_intensity / 16) as int) as intensity_band,
         |  count(*) as n_images,
         |  round(avg(mean_intensity), 6) + 0.0 as avg_intensity,
         |  cast(sum(intensity_histogram[1]) as bigint) as dark_pixels,
         |  cast(sum(intensity_histogram[16]) as bigint) as bright_pixels
         |from ${Stage.sqlPath("m2_image_feats")}
         |group by 1
         |order by 1""".stripMargin),
    "multimodal: decode-in-the-loop image features (staged) + hash-verified band rollup")

  /** Video frame sampling: every 2nd frame of each synthetic video becomes
    * a row (typed mapPartitions slice — the payload never leaves the
    * executor), per-frame byte statistics are extracted in the same pass
    * and STAGED; the per-video rollup downstream of the staged frames is
    * hash-verified. The Spark-side plumbing (binary column, frame slicing,
    * stride) is the real thing; the "decode" is the documented synthetic
    * raster (this container ships no video codec).
    */
  val frameSample = Q(
    "m3_frame_sample",
    (s, dir) => {
      val frames = Multimodal.frameStats(Multimodal.syntheticMedia(s, 300), 2)
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("n_bytes"),
          graft.Norm.rz(col("mean_intensity"), 6).as("mean_intensity"))
      Stage.through(frames, dir, "m3_frames")
        .groupBy("media_id")
        .agg(
          count(lit(1)).as("n_frames_sampled"),
          sum("n_bytes").as("total_bytes"),
          graft.Norm.rz(avg("mean_intensity"), 6).as("avg_intensity"),
          graft.Norm.rz(min("mean_intensity"), 6).as("min_intensity"),
          graft.Norm.rz(max("mean_intensity"), 6).as("max_intensity"))
        .orderBy("media_id")
    },
    Some(
      s"""select media_id, count(*) as n_frames_sampled,
         |  cast(sum(n_bytes) as bigint) as total_bytes,
         |  round(avg(mean_intensity), 6) + 0.0 as avg_intensity,
         |  round(min(mean_intensity), 6) + 0.0 as min_intensity,
         |  round(max(mean_intensity), 6) + 0.0 as max_intensity
         |from ${Stage.sqlPath("m3_frames")}
         |group by media_id
         |order by media_id""".stripMargin),
    "multimodal: stride frame sampling + per-frame stats (staged) + hash-verified per-video rollup")

  /** Audio feature extraction: deterministic PCM16 tones → per-row RMS /
    * zero-crossing rate / Welch dominant frequency (the SAME spectral
    * kernel that powers EEG band extraction), staged; the per-tone rollup
    * downstream is hash-verified. Completes the multimodal trio — image
    * (m2), video (m3), audio (m4) — each with its decode/extract step in
    * typed executor-side code and everything after it oracle-checked.
    */
  val audioFeatures = Q(
    "m4_audio_features",
    (s, dir) => {
      val feats = Multimodal.audioFeatures(Multimodal.syntheticAudio(s, 100))
        .toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          graft.Norm.rz(col("rms"), 6).as("rms"),
          graft.Norm.rz(col("zero_crossing_rate"), 6).as("zcr"),
          graft.Norm.rz(col("dominant_freq_hz"), 3).as("dominant_freq_hz"))
      Stage.through(feats, dir, "m4_audio_feats")
        .groupBy("dominant_freq_hz")
        .agg(
          count(lit(1)).as("n_clips"),
          graft.Norm.rz(avg("rms"), 6).as("avg_rms"),
          graft.Norm.rz(avg("zcr"), 6).as("avg_zcr"),
          min("media_id").as("min_media_id"))
        .orderBy("dominant_freq_hz")
    },
    Some(
      s"""select dominant_freq_hz, count(*) as n_clips,
         |  round(avg(rms), 6) + 0.0 as avg_rms,
         |  round(avg(zcr), 6) + 0.0 as avg_zcr,
         |  min(media_id) as min_media_id
         |from ${Stage.sqlPath("m4_audio_feats")}
         |group by dominant_freq_hz
         |order by dominant_freq_hz""".stripMargin),
    "multimodal: PCM16 decode + Welch dominant-freq features (staged) + hash-verified per-tone rollup")

  /** Image near-dup via perceptual hash: decode → 8×8 average-hash →
    * chunk-banded candidate pairs → Hamming verify — image dedup with the
    * exact machinery of d2 (a perceptual hash IS a 64-bit fingerprint to
    * the banded join). The synthetic corpus plants a near-duplicate in
    * every id-triple (five perturbed pixels — a re-encode analog), so the
    * expected pairs are known. ONLY the hashes (decode is not
    * DuckDB-reproducible) are staged — the d2 contract: chunk banding,
    * the bucket-size/star-cap skew guard, the candidate self-join AND
    * the Hamming verify are ALL recomputed independently by the oracle
    * from the staged 8-byte rows, so a banding bug that misses a planted
    * pair shows as a row mismatch, not a silently-trusted candidate set.
    * At 100 TB: one decode pass (payloads never leave executors), one
    * bounded band shuffle over 8-byte hashes — the payload bytes are
    * never joined.
    */
  val imageNearDup = Q(
    "m5_image_neardup",
    (s, dir) => {
      val sigs = Stage.through(
        Multimodal.imageHashes(Multimodal.syntheticImages(s, 300))
          .select(col("media_id").as("doc_id"), col("ahash").as("simhash")),
        dir, "m5_hashes")
      Dedup.hammingPairs(Dedup.simhashCandidatePairs(sigs), sigs)
        .filter(col("hamming") <= 6)
        .orderBy(col("hamming"), col("d1"), col("d2"))
    },
    Some(
      s"""with sigs as (
         |  select doc_id, simhash from ${Stage.sqlPath("m5_hashes")}
         |), ${candSqlCtes(SimhashBandedSelect, "doc_id")}
         |select c.d1, c.d2,
         |  cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
         |from cand c
         |join sigs a on a.doc_id = c.d1
         |join sigs b on b.doc_id = c.d2
         |where bit_count(xor(a.simhash, b.simhash)) <= 6
         |order by hamming, d1, d2""".stripMargin),
    "multimodal: perceptual-hash image near-dup — staged hashes only; banding + skew cap + Hamming verify all hash-verified")

  /** Audio near-dup via spectral fingerprint — completes the modality
    * symmetry (m5 is the image near-dup): PCM decode → Welch PSD → 64-band
    * mean-threshold fingerprint → d2's chunk-banded candidates → Hamming
    * verify. The synthetic corpus plants 24 groups of 5 gain/phase-jittered
    * copies of an 8-tone chord ([[Multimodal.syntheticAudioVariants]]), so
    * the expected pairs are known: jitter cancels in the spectrum (Hamming
    * 0 within a group), distinct chords share ≤2 of 8 bands (Hamming ≥ 12
    * across groups). ONLY the fingerprints (the Welch decode is not
    * DuckDB-reproducible) are staged — the d2 contract: chunk banding,
    * the star-cap skew guard, the candidate self-join AND the Hamming
    * verify are ALL recomputed independently by the oracle from the
    * staged 8-byte rows. At 100 TB: one decode pass (payloads never leave
    * executors), one bounded band shuffle over 8-byte fingerprints —
    * payload bytes are never joined, the m5 contract.
    */
  val audioNearDup = Q(
    "m6_audio_neardup",
    (s, dir) => {
      val sigs = Stage.through(
        Multimodal.audioFingerprints(
          Multimodal.syntheticAudioVariants(s, groups = 24, perGroup = 5)),
        dir, "m6_fps")
      Dedup.hammingPairs(Dedup.simhashCandidatePairs(sigs), sigs)
        .filter(col("hamming") <= 3)
        .orderBy(col("d1"), col("d2"))
    },
    Some(
      s"""with sigs as (
         |  select doc_id, simhash from ${Stage.sqlPath("m6_fps")}
         |), ${candSqlCtes(SimhashBandedSelect, "doc_id")}
         |select c.d1, c.d2,
         |  cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
         |from cand c
         |join sigs a on a.doc_id = c.d1
         |join sigs b on b.doc_id = c.d2
         |where bit_count(xor(a.simhash, b.simhash)) <= 3
         |order by d1, d2""".stripMargin),
    "multimodal: spectral-fingerprint audio near-dup — staged fingerprints only; banding + skew cap + Hamming verify all hash-verified")

  /** Video near-dup via per-frame perceptual hashes — completes the
    * image (m5) / audio (m6) / video modality symmetry: m3's frame slicing
    * chained into m5's average-hash gives `(media_id, frame_idx, fhash)`;
    * candidates come from per-frame chunk banding (band key = frame index ×
    * hash chunk, through the same star-capped band join as d2/m5/m6 —
    * clips colliding on ANY frame's chunk become a pair); the verify is
    * CLIP-level: frame-aligned mean Hamming over the sampled frames with
    * a ≥2-aligned-frames evidence floor, so a transcode that damages
    * every frame a little still matches while two clips sharing one
    * coincidental frame chunk do not — even unequal-length clips whose
    * single shared frame index collides exactly. The synthetic
    * corpus plants 24 groups of 5 per-frame-perturbed copies
    * ([[Multimodal.syntheticVideoVariants]]), so expected pairs are known.
    * ONLY the frame hashes (the decode is not DuckDB-reproducible) are
    * staged — the d2 contract: per-frame banding, the star-cap skew
    * guard, the candidate self-join AND the frame-aligned mean-Hamming
    * verify are ALL recomputed independently by the oracle from the
    * staged 12-byte rows. At 100 TB: one decode pass (payloads never
    * leave executors), then every shuffle moves hash rows — frames per
    * clip × 12 bytes, never pixels — the m5/m6 contract extended along
    * the time axis.
    */
  val videoNearDup = Q(
    "m7_video_neardup",
    (s, dir) => {
      val fh = Stage.through(
        Multimodal.videoFrameHashes(
          Multimodal.syntheticVideoVariants(s, groups = 24, perGroup = 5),
          stride = 2),
        dir, "m7_frame_hashes")
      Multimodal.videoNearDupPairs(fh)
        .select(col("d1"), col("d2"), col("n_frames_aligned"),
          graft.Norm.rz(col("avg_hamming"), 4).as("avg_hamming"))
        .filter(col("avg_hamming") <= 6.0)
        .orderBy("d1", "d2")
    },
    Some(
      s"""with fh as (
         |  select media_id, frame_idx, fhash
         |  from ${Stage.sqlPath("m7_frame_hashes")}
         |), ${candSqlCtes(
             "select f.media_id, f.frame_idx * 4 + g.c as band, " +
               "(f.fhash >> (g.c * 16)) & 65535 as bucket " +
               "from fh f cross join range(4) g(c)",
             "media_id")}, j as (
         |  select c.d1, c.d2, a.frame_idx,
         |    bit_count(xor(a.fhash, b.fhash)) as hd
         |  from cand c
         |  join fh a on a.media_id = c.d1
         |  join fh b on b.media_id = c.d2 and b.frame_idx = a.frame_idx
         |)
         |select d1, d2, count(*) as n_frames_aligned,
         |  round(avg(hd), 4) + 0.0 as avg_hamming
         |from j
         |group by d1, d2
         |having round(avg(hd), 4) <= 6.0 and count(*) >= 2
         |order by d1, d2""".stripMargin),
    "multimodal: clip-level video near-dup — staged frame hashes only; banding + skew cap + mean-Hamming verify all hash-verified")

  /** Semantic dedup scoring (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): cluster embeddings into IVF cells, then for every
    * vector find its nearest neighbor WITHIN its cell and flag it a
    * duplicate when the cosine crosses the threshold — the quadratic step
    * is confined to one cell, so at corpus scale nCells grows with n and
    * the per-cell work stays bounded (the whole point of the recipe). One
    * cell-keyed shuffle + one per-vector window; the cell assignment
    * (kmeans, spec-verified in OpsSpec) is staged, and the oracle
    * recomputes pairing, cosines, argmax, and verdicts from the staged
    * cells independently. Ranking uses the ROUNDED cosine (ties broken by
    * neighbor id) so the argmax can't flip on cross-engine summation-order
    * ulps — same discipline as e5/e6. Singleton-cell vectors keep null
    * neighbors and are never duplicates. The synthetic embeddings top out
    * at cosine ~0.51, so every verdict here is false — the VALUES under
    * test are the per-vector nearest-neighbor scores.
    */
  val semanticDedup = Q(
    "d6_semantic_dedup",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val seeds = Similarity.sampleCentroids(emb, "vec_id", "embedding", 16)
      val centroids = Similarity.kmeansStep(emb, "embedding",
        Similarity.kmeansStep(emb, "embedding", seeds))
      val cells = Stage.through(
        Similarity.ivfAssign(emb, "embedding", centroids)
          .select(col("vec_id"), col("cell")),
        dir, "d6_cells")
      val v = cells.join(emb, "vec_id")
      val pairs = v.as("a").join(v.as("b"),
          col("a.cell") === col("b.cell") &&
            col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn_id"),
          graft.Norm.rz(
            Similarity.cosine(col("a.embedding"), col("b.embedding")), 4)
            .as("nn_cos"))
      val w = Window.partitionBy("vec_id")
        .orderBy(col("nn_cos").desc, col("nn_id"))
      val best = pairs.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1).drop("rk")
      cells.select("vec_id").join(best, Seq("vec_id"), "left")
        .select(col("vec_id"), col("nn_id"), col("nn_cos"),
          coalesce(col("nn_cos") >= 0.95, lit(false)).as("is_dup"))
        .orderBy("vec_id")
    },
    Some(
      s"""with cells as (
         |  select vec_id, cell from ${Stage.sqlPath("d6_cells")}
         |), v as (
         |  select c.vec_id, c.cell, e.embedding
         |  from cells c join embeddings e on e.vec_id = c.vec_id
         |), f as (
         |  select a.vec_id as vec_id, b.vec_id as nn_id,
         |    unnest(a.embedding)::double as x, unnest(b.embedding)::double as y
         |  from v a join v b on a.cell = b.cell and a.vec_id <> b.vec_id
         |), d as (
         |  select vec_id, nn_id,
         |    round(sum(x * y) / nullif(sqrt(sum(x * x)) * sqrt(sum(y * y)), 0), 4)
         |      + 0.0 as nn_cos
         |  from f group by vec_id, nn_id
         |), best as (
         |  select vec_id, nn_id, nn_cos from (
         |    select vec_id, nn_id, nn_cos,
         |      row_number() over (partition by vec_id
         |        order by nn_cos desc, nn_id) as rk
         |    from d) t
         |  where rk = 1
         |)
         |select c.vec_id, b.nn_id, b.nn_cos,
         |  coalesce(b.nn_cos >= 0.95, false) as is_dup
         |from cells c left join best b on b.vec_id = c.vec_id
         |order by c.vec_id""".stripMargin),
    "semantic dedup: IVF-cell nearest-neighbor cosine + duplicate verdict (SemDeDup)")

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
      // brute-force over the SAMPLED query set; persisted — it feeds both
      // recall legs.
      val allPairs = broadcast(queries.select(col("vec_id").as("query_id")))
        .crossJoin(emb.select(col("vec_id").as("neighbor_id")))
        .filter(col("query_id") =!= col("neighbor_id"))
      val exact = Similarity
        .rerankTopK(allPairs, emb, "vec_id", "embedding", k = 5,
          roundTo = Some(4))
        .select(col("query_id"), col("neighbor_id"))
        .persist()
      def recallOf(ann: DataFrame, label: String): DataFrame =
        exact.join(ann, Seq("query_id", "neighbor_id"), "left")
          .groupBy("query_id")
          .agg(count(lit(1)).as("n_exact"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
          .select(lit(label).as("index_type"), col("query_id"),
            col("n_exact"), col("n_hits"),
            graft.Norm.rz(col("n_hits") / col("n_exact").cast("double"), 4)
              .as("recall_at_5"))
      recallOf(ivfTop, "ivf").unionAll(recallOf(pqTop, "pq"))
        .unionAll(recallOf(quantTop, "quantized"))
        .unionAll(recallOf(binTop, "binary"))
        .unionAll(recallOf(ivfPqTop, "ivfpq"))
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
      // truth feeds four consumers (two count aggregates + two semi-joins):
      // persist so the blocked self-join computes once, not four times.
      val truth = Dedup.exactJaccardPairsFromShingles(sh)
        .filter(col("jaccard") >= 0.5).select("d1", "d2").persist()
      def metricsOf(cands: DataFrame, label: String): DataFrame =
        cands.agg(count(lit(1)).as("n_cands"))
          .crossJoin(truth.agg(count(lit(1)).as("n_truth")))
          .crossJoin(truth.join(cands, Seq("d1", "d2"), "left_semi")
            .agg(count(lit(1)).as("n_hits")))
          .select(lit(label).as("method"), col("n_cands"), col("n_truth"),
            col("n_hits"),
            graft.Norm.rz(col("n_hits") /
              nullif(col("n_cands").cast("double"), lit(0.0)), 4).as("prec"),
            graft.Norm.rz(col("n_hits") /
              nullif(col("n_truth").cast("double"), lit(0.0)), 4)
              .as("recall"))
      metricsOf(lshCands, "lsh").unionAll(metricsOf(simCands, "simhash"))
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

  def all: Seq[Q] =
    Seq(ingest, lshNearDup, simhashNearDup, dedupClusters, canonicalDocs,
      bloomIncremental, embNearDupExact, lshAnn, ivfAnn, pqAnn, ivfPqAnn,
      annRecall, annRecallMulti, mediaStats, imageFeatures, frameSample,
      audioFeatures, imageNearDup, audioNearDup, videoNearDup, semanticDedup,
      dedupEval, minhashAccuracy, bloomFpr)
}
