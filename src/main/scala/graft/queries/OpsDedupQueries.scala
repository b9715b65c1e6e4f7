package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Stage, Tables}
import graft.ops.{Components, Dedup, Similarity}
import OpsShared._

/** Document deduplication operators (d1-d6): LSH / SimHash near-dup,
  * connected-component clustering, canonical-doc selection, Bloom
  * incremental dedup, and SemDeDup semantic dedup. Split out of the
  * former `OpsQueries` monolith unchanged; staging/oracle contract in
  * [[OpsQueries]]'s doc.
  */
object OpsDedupQueries {

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
}
