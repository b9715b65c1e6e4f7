package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at corpus scale (north star ops; SURVEY §7.5).
  *
  * The scale path is MinHash + LSH banding: per-document signatures from k
  * hash functions over token shingles, banded so that two documents collide
  * in some band with probability ≈ 1-(1-s^r)^b for Jaccard s — the standard
  * Broder/LSH construction from the public literature. Everything is
  * declarative DataFrame code: explode → groupBy → band join. The only
  * shuffles are on (doc, shingle) and band buckets; no all-pairs product
  * ever materializes, so cost scales with corpus size × signature width,
  * not corpus².
  *
  * Hash functions: xxhash64 with per-function seed columns — codegen'd,
  * 64-bit, no UDFs in the hot path.
  */
object Dedup {

  /** (doc_id, shingle-hash) pairs, distinct per doc; n-token shingles.
    * The token-array slice is hashed directly (no string rebuild) — 64-bit
    * keys shuffle cheaply and the 2⁻⁶⁴ collision rate is noise next to
    * MinHash's own estimation error.
    */
  def shingles(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(
      col("doc_id"),
      explode(graft.expressions.ShingleHashes(split(col(textCol), " "), n))
        .as("shingle"))

  /** MinHash signature table: doc_id, mh0..mh{k-1}. One shuffle on doc_id;
    * the k mins are computed in a single hash aggregate.
    */
  def minhashSignatures(shingled: DataFrame, k: Int): DataFrame = {
    val mins = (0 until k).map(j =>
      min(xxhash64(col("shingle"), lit(j))).as(s"mh$j"))
    shingled.groupBy("doc_id").agg(mins.head, mins.tail: _*)
  }

  /** LSH candidate pairs: signatures split into `bands` bands of
    * `rowsPerBand` rows; documents sharing any band bucket become a
    * candidate pair. Returns distinct (d1, d2) with d1 < d2.
    */
  def lshCandidates(signatures: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), hash(rows: _*).as("bucket")).as(s"band$b")
    }
    val banded = signatures
      .select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"),
        explode(array((0 until bands).map(b => col(s"band$b")): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Estimated Jaccard for candidate pairs from signature agreement —
    * the cheap verify stage before (optional) exact rerank.
    */
  def estimateJaccard(candidates: DataFrame, signatures: DataFrame, k: Int): DataFrame = {
    val sigCols = (0 until k).map(j => col(s"mh$j"))
    val s1 = signatures.select(col("doc_id").as("d1"),
      array(sigCols: _*).as("sig1"))
    val s2 = signatures.select(col("doc_id").as("d2"),
      array(sigCols: _*).as("sig2"))
    candidates.join(s1, "d1").join(s2, "d2")
      .select(col("d1"), col("d2"),
        (size(filter(zip_with(col("sig1"), col("sig2"), (a, b) => a === b),
          x => x)).cast("double") / k).as("est_jaccard"))
  }

  /** Drop shingles appearing in more than `maxDocFreq` documents — the
    * skew guard for web-scale corpora: boilerplate shingles ("all rights
    * reserved …") occur in millions of documents and would blow up any
    * shingle-blocked join quadratically while carrying no dedup signal.
    * One extra aggregation on the shingle key; rare (discriminative)
    * shingles are untouched, so true near-dups still collide.
    */
  def capShingleFrequency(shingled: DataFrame, maxDocFreq: Int): DataFrame = {
    val hot = shingled.groupBy("shingle")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("shingle")
    shingled.join(hot, Seq("shingle"), "left_anti")
  }

  /** End-to-end near-dup pipeline: shingle → sign → band → estimate →
    * threshold. k = bands * rowsPerBand signatures.
    *
    * @param maxShingleDocFreq drop shingles shared by more than this many
    *        docs before signing (0 disables) — see [[capShingleFrequency]]
    */
  def nearDuplicates(docs: DataFrame, textCol: String = "text",
      shingleLen: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
      minJaccard: Double = 0.5, maxShingleDocFreq: Int = 0): DataFrame = {
    val k = bands * rowsPerBand
    val sh0 = shingles(docs, textCol, shingleLen)
    val sh = if (maxShingleDocFreq > 0) capShingleFrequency(sh0, maxShingleDocFreq)
      else sh0
    // The signature table feeds four consumers (two band-join sides, two
    // estimate-join sides); persist it so the shingle+minhash pipeline runs
    // once — at scale this is the standard "materialize signatures" step of
    // LSH dedup (they're k longs per doc, tiny next to the corpus).
    val sigs = minhashSignatures(sh, k).persist()
    val cands = lshCandidates(sigs, bands, rowsPerBand)
    estimateJaccard(cands, sigs, k).filter(col("est_jaccard") >= minJaccard)
  }

  /** Exact near-dup oracle (for tests / small data): full pairwise Jaccard
    * over shingle sets via a shingle-blocked join — the same shape as
    * TextQueries.t6 but parameterized.
    */
  def exactJaccardPairs(docs: DataFrame, textCol: String = "text",
      shingleLen: Int = 5): DataFrame = {
    val sh = shingles(docs, textCol, shingleLen)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .as("jaccard"))
  }

  /** Embedding-cosine near-dup: pairs with cosine ≥ threshold, blocked by
    * random-hyperplane LSH signature so only same-bucket pairs are compared
    * (see [[Similarity.hyperplaneSignature]]).
    */
  def embeddingNearDuplicates(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95, planes: Int = 8, seed: Long = 7L): DataFrame = {
    val signed = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.hyperplaneSignature(col(vecCol), planes,
        Similarity.randomPlanes(planes, Similarity.dimOf(emb, vecCol), seed))
        .as("sig"))
    signed.as("a").join(signed.as("b"),
      col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
