package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.ingest.{Ingest, SyntheticSource}
import graft.ops.{Dedup, Multimodal, Similarity}
import graft.sleep.SleepModels

/** North-star / scale-path operators surfaced through the driver contract.
  * LSH bucketing and the signal kernels aren't reasonably ANSI-SQL
  * expressible, so those entries ship without an oracle (rows-only check) —
  * their semantics are verified by ScalaTest against exact baselines
  * (DedupSpec / SimilaritySpec / IngestSpec). The exact embedding near-dup
  * IS oracle-checked via DuckDB's list_cosine_similarity.
  */
object OpsQueries {

  /** Full signal path: synthetic EDF recordings → binary parse → epoch →
    * Welch PSD → band power → model DAG → summary mart. Deterministic
    * (seeded); independent of sfDir by design — the signal source is the
    * engine's own (reference S1-S3 have no testdata analog).
    */
  val ingest = Q(
    "ingest_sleep_summary",
    (s, _) => {
      // Persist extraction output before the model DAG: the DAG's episode
      // ranking consumes its input three times, and unlike a parquet scan
      // the signal kernels are expensive to recompute. Mirrors the real
      // pipeline, which materializes epochs into the warehouse first.
      val epochs = Ingest.epochsOf(Ingest.extractSynthetic(s, 2)).persist()
      SleepModels.sleepSummary(
        SleepModels.sleepMetrics(SleepModels.staging(epochs)))
        .orderBy("subject_id")
    },
    None,
    "S1/S2/N1-N6: EDF parse → Welch → band power → marts (ScalaTest-verified)")

  /** MinHash-LSH near-dup on documents — the scale path for t6's exact
    * Jaccard (recall verified in DedupSpec).
    */
  val lshNearDup = Q(
    "d1_lsh_neardup",
    (s, dir) =>
      Dedup.nearDuplicates(Tables.documents(s, dir), minJaccard = 0.3)
        .orderBy(col("est_jaccard").desc, col("d1"), col("d2")),
    None,
    "dedup-minhash-lsh: banded candidate pairs + signature Jaccard")

  /** Exact embedding near-dup pairs (cosine ≥ 0.8): brute-force on both
    * sides so the DuckDB oracle (list_cosine_similarity) hash-matches. The
    * LSH-blocked scale variant is [[lshAnn]] / Dedup.embeddingNearDuplicates
    * (rows-only + ScalaTest recall).
    */
  val embNearDupExact = Q(
    "e4_embedding_neardup",
    (s, dir) => {
      // Blocked all-pairs kernel (Similarity.bruteForcePairs): the vector
      // matrix broadcasts and each partition streams a tight dot-product
      // loop, emitting only qualifying pairs — a join-based spelling would
      // materialize all O(n²) joined rows to compute one dot each.
      Similarity.bruteForcePairs(Tables.embeddings(s, dir),
        "vec_id", "embedding", minCosine = 0.8)
        .select(col("id1"), col("id2"), round(col("cosine"), 4).as("cosine"))
        .filter(col("cosine") >= 0.8)
        .orderBy(col("cosine").desc, col("id1"), col("id2"))
    },
    Some("""select a.vec_id as id1, b.vec_id as id2,
      round(list_cosine_similarity(a.embedding, b.embedding), 4) as cosine
    from embeddings a join embeddings b on a.vec_id < b.vec_id
    where round(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.8
    order by cosine desc, id1, id2"""),
    "similarity: exact cosine near-dup pairs (oracle: list_cosine_similarity)")

  /** LSH-bucketed ANN top-5 for the first 20 vectors — the scale path for
    * e1's brute force (recall verified in SimilaritySpec).
    */
  val lshAnn = Q(
    "e5_lsh_ann",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 20),
        "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 4).as("cosine"), col("rank"))
        .orderBy("query_id", "rank")
    },
    None,
    "similarity: hyperplane-LSH ANN top-k (recall vs e1 in ScalaTest)")

  /** Multimodal metadata rollup over the synthetic media table (binary
    * payloads + typed metadata; decode plumbing tested in MultimodalSpec).
    */
  val mediaStats = Q(
    "m1_media_stats",
    (s, _) =>
      Multimodal.mediaStats(Multimodal.syntheticMedia(s, 300).toDF())
        .orderBy("kind"),
    None,
    "multimodal: binary-column metadata rollup")

  def all: Seq[Q] = Seq(ingest, lshNearDup, embNearDupExact, lshAnn, mediaStats)
}
