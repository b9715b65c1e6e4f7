package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    *
    * Skew guard: a band bucket holding B docs yields B(B-1)/2 pairs — one
    * viral bucket (mass-duplicated boilerplate) turns the join quadratic.
    * Buckets larger than `maxBucketSize` are star-expanded instead: each
    * member pairs only with the bucket's minimum doc_id (B-1 pairs), so
    * duplicate GROUPS stay discoverable through their representative while
    * candidate volume stays linear in bucket size. Normal buckets (the
    * overwhelming majority on a healthy corpus) are unaffected.
    */
  def lshCandidates(signatures: DataFrame, bands: Int, rowsPerBand: Int,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val bandCols: Seq[Column] = (0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), hash(rows: _*).as("bucket")).as(s"band$b")
    }
    val banded = signatures
      .select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"),
        explode(array((0 until bands).map(b => col(s"band$b")): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    cappedPairJoin(banded, maxBucketSize)
  }

  /** Public face of [[cappedPairJoin]] for callers that build their own
    * `(doc_id, band, bucket)` banding — e.g. the per-frame video banding
    * (m7), where the band key composes (frame index, hash chunk). Same
    * star-cap skew guard as every other band join.
    */
  def bandedCandidatePairs(banded: DataFrame,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame =
    cappedPairJoin(banded, maxBucketSize)

  /** Distinct (d1, d2) pairs from a (doc_id, band, bucket) table with the
    * star-expansion skew guard — shared by the MinHash band join and the
    * SimHash chunk join. One shuffle on (band, bucket) computes both bucket
    * size and representative; the pair join reuses that partitioning.
    */
  private def cappedPairJoin(banded: DataFrame, maxBucketSize: Int): DataFrame = {
    val w = Window.partitionBy("band", "bucket")
    // Persisted: the marked table feeds three consumers (both sides of the
    // small-bucket self-join and the star expansion) — without it the
    // upstream signature/window pipeline recomputes per side. It is one
    // row per (doc, band) — linear in corpus size, spillable.
    val marked = banded
      .withColumn("bsize", count(lit(1)).over(w))
      .withColumn("bmin", min("doc_id").over(w))
      .persist()
    val small = marked.filter(col("bsize") <= maxBucketSize)
    val smallPairs = small.as("a")
      .join(small.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
    val starPairs = marked
      .filter(col("bsize") > maxBucketSize && col("doc_id") =!= col("bmin"))
      .select(col("bmin").as("d1"), col("doc_id").as("d2"))
    smallPairs.union(starPairs).distinct()
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

  /** Default skew-guard settings, ON unless a caller opts out. A shingle in
    * > 128 documents is boilerplate, not dedup signal (discriminative
    * shingles of true near-dup groups sit far below it); a band bucket past
    * 64 members only arises from such mass duplication and star-expands
    * (see [[lshCandidates]]). On a healthy corpus neither guard fires — on a
    * skewed one they bound candidate volume linearly.
    */
  val DefaultMaxShingleDocFreq = 128
  val DefaultMaxBucketSize = 64

  /** End-to-end near-dup pipeline: shingle → sign → band → estimate →
    * threshold. k = bands * rowsPerBand signatures.
    *
    * @param maxShingleDocFreq drop shingles shared by more than this many
    *        docs before signing (0 disables) — see [[capShingleFrequency]]
    */
  def nearDuplicates(docs: DataFrame, textCol: String = "text",
      shingleLen: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
      minJaccard: Double = 0.5,
      maxShingleDocFreq: Int = DefaultMaxShingleDocFreq): DataFrame = {
    val k = bands * rowsPerBand
    val sh = cappedShingles(docs, textCol, shingleLen, maxShingleDocFreq)
    // The signature table feeds four consumers (two band-join sides, two
    // estimate-join sides); persist it so the shingle+minhash pipeline runs
    // once — at scale this is the standard "materialize signatures" step of
    // LSH dedup (they're k longs per doc, tiny next to the corpus).
    val sigs = minhashSignatures(sh, k).persist()
    val cands = lshCandidates(sigs, bands, rowsPerBand)
    estimateJaccard(cands, sigs, k).filter(col("est_jaccard") >= minJaccard)
  }

  private def cappedShingles(docs: DataFrame, textCol: String,
      shingleLen: Int, maxShingleDocFreq: Int): DataFrame = {
    val sh = shingles(docs, textCol, shingleLen)
    if (maxShingleDocFreq > 0) capShingleFrequency(sh, maxShingleDocFreq)
    else sh
  }

  /** LSH candidate (d1, d2) pairs alone — the non-SQL-expressible stage of
    * the near-dup pipeline, split out so callers can stage the candidate
    * set and hash-verify the exact rerank downstream (OpsQueries.d1).
    */
  def candidatePairs(docs: DataFrame, textCol: String = "text",
      shingleLen: Int = 5, bands: Int = 8, rowsPerBand: Int = 4,
      maxShingleDocFreq: Int = DefaultMaxShingleDocFreq): DataFrame =
    candidatePairsFromShingles(shingles(docs, textCol, shingleLen),
      bands, rowsPerBand, maxShingleDocFreq)

  /** [[candidatePairs]] over a pre-built (doc_id, shingle) table — lets a
    * caller compute (and persist) the shingle table ONCE and feed both
    * candidate generation and the exact rerank from it.
    */
  def candidatePairsFromShingles(sh: DataFrame, bands: Int = 8,
      rowsPerBand: Int = 4,
      maxShingleDocFreq: Int = DefaultMaxShingleDocFreq): DataFrame = {
    val capped = if (maxShingleDocFreq > 0)
      capShingleFrequency(sh, maxShingleDocFreq) else sh
    lshCandidates(minhashSignatures(capped, bands * rowsPerBand), bands, rowsPerBand)
  }

  /** Exact shingle-Jaccard rerank restricted to the given (d1, d2) pairs —
    * the verify stage after LSH candidate generation. Cost is
    * O(pairs × shingles-per-doc) via two id-keyed joins; no all-pairs
    * product. The UNCAPPED shingle sets are used (the frequency cap is a
    * candidate-generation heuristic; the reported Jaccard stays the true
    * document similarity).
    */
  def rerankJaccard(pairs: DataFrame, docs: DataFrame, textCol: String = "text",
      shingleLen: Int = 5): DataFrame =
    rerankJaccardOnShingles(pairs, shingles(docs, textCol, shingleLen))

  /** [[rerankJaccard]] over a pre-built UNCAPPED (doc_id, shingle) table.
    *
    * Shape: per-doc shingle sets are collected ONCE into sorted arrays
    * (one hash aggregate over the shingle table — the same shuffle the old
    * per-doc size count already paid), then each candidate pair is scored
    * by a single fused merge loop
    * ([[graft.expressions.SortedIntersectCount]]). The relational
    * explode-join spelling this replaces shuffled |pairs| × |set| rows
    * (~50M at the 10× ScaleCheck leg) through TWO joins plus a count
    * aggregate; this moves |pairs| rows + two array lookups and no
    * per-element rows at all. Intersection counts are exact integers, so
    * jaccard values are bit-identical to the explode-join spelling and
    * the DuckDB oracle.
    */
  def rerankJaccardOnShingles(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_set(col("shingle"))).as("sset"))
      .select(col("doc_id"), col("sset"), size(col("sset")).as("n"))
    pairs
      .join(sets.select(col("doc_id").as("d1"), col("sset").as("s1"),
        col("n").as("n1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sset").as("s2"),
        col("n").as("n2")), "d2")
      .withColumn("inter",
        graft.expressions.SortedIntersectCount(col("s1"), col("s2")))
      .select(col("d1"), col("d2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .as("jaccard"))
  }

  /** Exact near-dup oracle (for tests / small data): full pairwise Jaccard
    * over shingle sets via a shingle-blocked join — the same shape as
    * TextQueries.t6 but parameterized.
    */
  def exactJaccardPairs(docs: DataFrame, textCol: String = "text",
      shingleLen: Int = 5): DataFrame =
    exactJaccardPairsFromShingles(shingles(docs, textCol, shingleLen))

  /** [[exactJaccardPairs]] over a pre-built (doc_id, shingle) table — lets
    * a caller (d7's eval) compute and persist the shingle table ONCE and
    * feed both the LSH candidate generator and the exact ground truth.
    */
  def exactJaccardPairsFromShingles(sh: DataFrame): DataFrame = {
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

  /** 64-bit SimHash fingerprint per document (Charikar, public literature):
    * each token hashes to 64 bits (xxhash64 — codegen'd, no UDF); every bit
    * position takes a ±1 vote per occurrence; the fingerprint sets the bits
    * with positive vote sums.
    *
    * Spelled as ONE columnar hash aggregate — 64 bit-count sums plus a row
    * count per doc — so the whole pass stays inside whole-stage codegen
    * with map-side partial aggregation (a vote of +1/-1 per occurrence is
    * positive iff 2·(count of set bits) > token count, so plain sums
    * suffice; an earlier typed-Aggregator spelling fell out of codegen
    * into ObjectHashAggregate and cost ~1 s of overhead per run on tiny
    * inputs). The fingerprint reassembles via a bitwise OR of the 64
    * thresholded bits in a single projection.
    */
  def simhash64(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map(b =>
      sum(shiftright(col("h"), b).bitwiseAND(lit(1L))).as(s"s$b"))
    val aggs = count(lit(1)).as("n") +: bitSums
    val fingerprint = (0 until 64)
      .map(b => when(col(s"s$b") * 2 > col("n"), lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    toks.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), fingerprint.as("simhash"))
  }

  /** Candidate pairs from SimHash chunk banding: the 64-bit fingerprint
    * splits into `bands` equal chunks; pairs sharing any (chunk index,
    * chunk value) collide. Pigeonhole: any pair within Hamming distance
    * `bands - 1` keeps at least one chunk intact, so recall at distance
    * ≤ bands-1 is exact. Same star-cap skew guard as the MinHash join.
    */
  def simhashCandidatePairs(sigs: DataFrame, bands: Int = 4,
      maxBucketSize: Int = DefaultMaxBucketSize): DataFrame = {
    val chunkBits = 64 / bands
    val mask = (1L << chunkBits) - 1
    val banded = sigs
      .select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .select(col("doc_id"), col("band"),
        expr(s"shiftright(simhash, band * $chunkBits) & $mask").as("bucket"))
    cappedPairJoin(banded, maxBucketSize)
  }

  /** End-to-end SimHash near-dup: fingerprint → chunk-banded candidates →
    * Hamming verify (`bit_count(xor)`) at ≤ `maxHamming` (≤ bands-1 keeps
    * candidate recall exact; higher thresholds trade recall for cost).
    */
  def simhashNearDuplicates(docs: DataFrame, textCol: String = "text",
      maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    val sigs = simhash64(docs, textCol).persist()
    hammingPairs(simhashCandidatePairs(sigs, bands), sigs)
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming distance for given (d1, d2) pairs from a (doc_id, simhash)
    * table — the verify stage, split out so it can run over STAGED
    * signatures and be hash-checked by an independent engine.
    */
  def hammingPairs(pairs: DataFrame, sigs: DataFrame): DataFrame =
    pairs
      .join(sigs.select(col("doc_id").as("d1"), col("simhash").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("simhash").as("s2")), "d2")
      .select(col("d1"), col("d2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).cast("int").as("hamming"))

  /** Incremental dedup of a new batch against an existing corpus: the
    * batch rows whose `keyCol` does NOT appear in the corpus, exactly.
    *
    * The corpus key set is sketched into a [[org.apache.spark.util.sketch
    * .BloomFilter]] (built distributed — per-partition partial sketches
    * OR-merged, one pass, no key shuffle) and probed map-side via
    * [[graft.expressions.BloomMightContain]]. Bloom filters have no false
    * negatives, so bloom-negative rows are new BY PROOF and skip the join
    * entirely; only the bloom-positive sliver (true dups + ~fpp false
    * positives) pays the exact anti-join verification. At an incremental
    * ingest against a 100 TB corpus this turns "anti-join every batch row
    * against billions of keys" into "anti-join ~1% of the batch", while
    * staying byte-equivalent to the plain anti join — which is exactly
    * what the d5 oracle recomputes.
    */
  def incrementalNew(corpus: DataFrame, batch: DataFrame, keyCol: String,
      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = corpus.stat.bloomFilter(keyCol, math.max(expectedItems, 64L), fpp)
    val probed = batch.withColumn("maybe_dup",
      graft.expressions.BloomMightContain(col(keyCol), bloom))
    val provenNew = probed.filter(!col("maybe_dup")).drop("maybe_dup")
    val verifiedNew = probed.filter(col("maybe_dup")).drop("maybe_dup")
      .join(corpus.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
    provenNew.unionByName(verifiedNew)
  }

  /** ExactSubstr duplicated-span coverage (Lee et al. 2022): per document,
    * how many of its tokens sit inside a k-token span that appears verbatim
    * in ANOTHER document. The cross-doc test is min≠max of doc_id over a
    * window partitioned by the gram (one shuffle, no agg+join round-trip);
    * coverage is the interval union of [start, start+k-1] over duplicated
    * starts, computed as a lag-capped gaps-and-islands sum — rows after the
    * flag step are duplicated STARTS only, so the coverage pass is bounded
    * by the duplication volume, never the corpus token count.
    *
    * Returns (doc_id, n_tokens, n_dup_starts, covered_tokens); callers add
    * ratios/rounding/order.
    */
  def substringCoverage(docs: DataFrame, textCol: String = "text",
      k: Int = 10): DataFrame = {
    val grams = docs
      .select(col("doc_id"), split(col(textCol), " ").as("t"))
      .filter(size(col("t")) >= k)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(t) - $k)," +
          s" i -> concat_ws(' ', slice(t, i + 1, $k)))"))
        .as(Seq("pos", "g")))
    val wg = Window.partitionBy("g")
    val dupStarts = grams
      .withColumn("dup", min("doc_id").over(wg) =!= max("doc_id").over(wg))
      .filter(col("dup"))
      .select("doc_id", "pos")
    val wd = Window.partitionBy("doc_id").orderBy("pos")
    val cov = dupStarts
      .withColumn("contrib",
        least(lit(k),
          col("pos") - coalesce(lag("pos", 1).over(wd), col("pos") - k)))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_starts"),
        sum("contrib").cast("long").as("covered_tokens"))
    docs.select(col("doc_id"),
        size(split(col(textCol), " ")).as("n_tokens"))
      .join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_starts"), lit(0L)).as("n_dup_starts"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
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
