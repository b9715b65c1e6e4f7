package graft

import org.apache.spark.sql.functions._

/** Ground-truth checks for the round-3-late text/eval queries on PLANTED
  * fixtures (the sf oracle hash-verifies engine parity, not the semantics;
  * these fixtures pin the semantics themselves): ExactSubstr coverage on
  * known duplicated spans, winnowing's shared-fingerprint guarantee on an
  * identical pair, the Gopher gate on a crafted pass/fail split, and the
  * retention matrix on a 3-user hand example.
  */
class TextEvalSpec extends SparkSpec {

  import spark.implicits._

  /** documents table: doc 0 and doc 3 identical (30 tokens); doc 1 shares
    * tokens 10–24 of doc 0 (a 15-token verbatim span) inside otherwise
    * unique text; doc 2 fully unique; doc 4 stopword-rich plain words.
    */
  private lazy val fixtureDocs: Seq[(Long, String, String, String)] = {
    val base = (0 until 30).map(i => s"a$i")
    val doc0 = base.mkString(" ")
    val doc1 = ((0 until 10).map(i => s"b$i") ++ base.slice(10, 25) ++
      (0 until 10).map(i => s"c$i")).mkString(" ")
    val doc2 = (0 until 30).map(i => s"d$i").mkString(" ")
    val doc4 = "the data of value and table to scan in row is key the part"
    Seq(
      (0L, doc0, "en", "s0"), (1L, doc1, "en", "s0"), (2L, doc2, "de", "s1"),
      (3L, doc0, "en", "s1"), (4L, doc4, "en", "s1"))
  }

  private lazy val docsDir: String = {
    val dir = tmpDir("graft_texteval")
    fixtureDocs
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t31 coverage matches the planted duplicated spans exactly") {
    val rows = Registry.byName("t31_substring_dedup").run(spark, docsDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("covered_tokens"), r.getAs[Double]("dup_frac"))).toMap
    // docs 0 and 3 are identical: every token covered.
    assert(rows(0L) == (30L, 1.0) && rows(3L) == (30L, 1.0))
    // doc 1: the 15-token shared span yields starts 10..15 in doc 0 and
    // exactly 15 covered tokens in doc 1 (35 tokens total).
    assert(rows(1L)._1 == 15L)
    // unique docs: zero coverage.
    assert(rows(2L)._1 == 0L && rows(4L)._1 == 0L)
  }

  test("t33 winnowing links the identical pair and never the unique doc") {
    val pairs = Registry.byName("t33_winnowing").run(spark, docsDir)
      .collect().map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs.contains((0L, 3L)),
      "identical docs share their whole winnowed fingerprint set")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "a fully unique doc shares no fingerprint")
  }

  test("t34 gopher gate keeps the stopword-rich doc and cuts the rest") {
    val keep = Registry.byName("t34_gopher_rules").run(spark, docsDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("keep")).toMap
    assert(keep(4L), "plain stopword-rich text passes every rule")
    // a0..a29 tokens contain digits: alpha fraction 0 and no stopwords.
    assert(!keep(0L) && !keep(2L))
  }

  test("q35 retention matrix matches a 3-user hand example") {
    val dir = tmpDir("graft_retention")
    val wk = 604800000000000L
    // u1 active weeks w and w+1; u2 week w only; u3 week w+1 only.
    Seq((0L, 2817L * wk + 5L, 1L), (1L, 2818L * wk + 5L, 1L),
      (2L, 2817L * wk + 9L, 2L), (3L, 2818L * wk + 9L, 3L))
      .toDF("event_id", "ts", "user_id")
      .withColumn("event_type", lit("view"))
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val cells = Registry.byName("q35_retention").run(spark, dir)
      .collect().map(r => (r.getAs[Long]("cohort_week"),
        r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
          r.getAs[Double]("retention"))).toMap
    assert(cells((2817L, 0L)) == (2L, 2L, 1.0))
    assert(cells((2817L, 1L)) == (1L, 2L, 0.5))
    assert(cells((2818L, 0L)) == (1L, 1L, 1.0))
    assert(cells.size == 3)
  }

  /** BPE-apply fixture with hand-computable merges. Pair stats: "aa" 11
    * (from aaaa×3 and aaa), "he"/"th" 2 each (tie → pair-asc puts "he"
    * first), "bc" 1 — so the learned rank order is aa, he, th, bc.
    */
  private lazy val bpeDir: String = {
    val dir = tmpDir("graft_bpe")
    Seq(
      (0L, "aaaa aaaa aaaa", "en", "s0"),
      (1L, "the the", "en", "s0"),
      (2L, "aaa bc", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t37 BPE apply: greedy within-pass merges, rank priority, vocab ids") {
    val rows = Registry.byName("t37_bpe_apply").run(spark, bpeDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types")),
          (r.getAs[String]("top_token"), r.getAs[Long]("top_n"),
            r.getAs[Long]("top_token_id")))).toMap
    // "aaaa" under rule (a,a): left-to-right non-overlapping → aa|aa
    // (NOT aa|a|a and NOT a re-merged across the fresh token).
    assert(rows(0L) == ((6L, 1L), ("aa", 6L, 1L)))
    // "the": rank-2 "he" fires before rank-3 "th" → t|he; had the priority
    // been wrong the tokens would be th|e. Tie on count (t=2, he=2)
    // resolves to the lexicographically smaller top_token "he".
    assert(rows(1L) == ((4L, 2L), ("he", 2L, 2L)))
    // "aaa" → aa|a (odd run keeps a single tail char); "bc" merges whole.
    // Corpus vocab: aa(7), he(2), t(2), a(1), bc(1) → "a" has id 4.
    assert(rows(2L) == ((3L, 3L), ("a", 1L, 4L)))
  }

  test("t38 Kneser-Ney perplexity matches an independent in-memory model") {
    val got = Registry.byName("t38_kneser_ney").run(spark, docsDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("kn_perplexity"))).toMap

    // Independent plain-Scala Kneser-Ney (D = 0.75) over the same corpus.
    val docBigrams = fixtureDocs.map { case (id, text, _, _) =>
      id -> text.split(" ").toSeq.sliding(2).map(w => (w(0), w(1))).toSeq
    }
    val c12 = docBigrams.flatMap(_._2).groupBy(identity).map {
      case (k, v) => k -> v.size
    }
    val c1 = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val n1f = c12.groupBy(_._1._1).map { case (w1, m) => w1 -> m.size }
    val n1b = c12.groupBy(_._1._2).map { case (w2, m) => w2 -> m.size }
    val tt = c12.size.toDouble
    def p(b: (String, String)): Double =
      (math.max(c12(b) - 0.75, 0.0) +
        0.75 * n1f(b._1) * (n1b(b._2) / tt)) / c1(b._1)

    docBigrams.foreach { case (id, bgs) =>
      val want = math.exp(bgs.map(b => -math.log(p(b))).sum / bgs.size)
      val (nBg, ppl) = got(id)
      assert(nBg == bgs.size, s"doc $id: ${nBg} bigrams, want ${bgs.size}")
      assert(math.abs(ppl - want) < 5e-4,
        s"doc $id: perplexity $ppl, independent model $want")
    }
    // Identical documents score identically.
    assert(got(0L) == got(3L))
  }
}
