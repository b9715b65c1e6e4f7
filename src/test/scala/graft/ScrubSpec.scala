package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Ground-truth checks for the round-7 scrubbing queries on PLANTED
  * fixtures (the sf oracle hash-verifies engine parity; these pin the
  * semantics): t44's per-category span counts and masked text against a
  * hand-computed expectation, and t45's document-frequency threshold on a
  * corpus where the boilerplate lines are planted with known frequencies.
  */
class ScrubSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ---- t44_pii_scrub -------------------------------------------------

  /** doc_ids chosen to exercise every injection combination:
    * 0 → email+phone+ssn, 3 → email, 4 → phone, 5 → ssn, 7 → none.
    */
  private lazy val piiDir: String = {
    val dir = tmpDir("graft_scrub_pii")
    Seq(0L, 3L, 4L, 5L, 7L)
      .map(id => (id, s"plain words only doc$id", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t44 counts each planted PII category exactly once per injection") {
    val rows = Registry.byName("t44_pii_scrub").run(spark, piiDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_email"), r.getAs[Long]("n_phone"),
          r.getAs[Long]("n_ssn"), r.getAs[Boolean]("has_pii")))).toMap
    assert(rows(0L) == ((1L, 1L, 1L, true)))
    assert(rows(3L) == ((1L, 0L, 0L, true)))
    assert(rows(4L) == ((0L, 1L, 0L, true)))
    assert(rows(5L) == ((0L, 0L, 1L, true)))
    assert(rows(7L) == ((0L, 0L, 0L, false)))
  }

  test("t44 masked text replaces every span and nothing else") {
    val got = Registry.byName("t44_pii_scrub").run(spark, piiDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("masked_md5")).toMap
    // Hand-built expectation for doc 0 (email+phone+ssn injected):
    // text + ' contact user0@mail.example.com call 555-000-0000
    // id 123-45-0000' with each span replaced by its tag.
    val expected0 = "plain words only doc0" +
      " contact [EMAIL] call [PHONE] id [SSN]"
    assert(got(0L) == md5hex(expected0))
    // No-PII doc: masking is the identity.
    assert(got(7L) == md5hex("plain words only doc7"))
  }

  // ---- t45_line_dedup ------------------------------------------------

  /** Source s0 has 6 docs (header/footer df=6 ≥ 5 → dropped) and a planted
    * repeated content line in 5 of them (df=5 → dropped); source s1 has 3
    * docs, so even its identical header/footer stay (df=3 < 5).
    * Content is exactly one 10-token line per doc to keep counts exact.
    */
  private lazy val lineDir: String = {
    val dir = tmpDir("graft_scrub_lines")
    val boiler = (0 until 10).map(_ => "nav").mkString(" ")
    def uniq(id: Long) = (0 until 10).map(i => s"w${id}x$i").mkString(" ")
    val s0 = (0L until 6L).map { id =>
      val text = if (id < 5) boiler + " " + uniq(id) else uniq(id)
      (id, text, "en", "s0")
    }
    val s1 = (10L until 13L).map(id => (id, uniq(id), "en", "s1"))
    (s0 ++ s1).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t45 drops lines at doc-frequency >= 5 within their source only") {
    val rows = Registry.byName("t45_line_dedup").run(spark, lineDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_dropped")))).toMap
    // s0 docs 0-4: header + boiler-line + unique-line + footer = 4 lines;
    // header, footer, and the df=5 boiler line all drop.
    (0L until 5L).foreach(id => assert(rows(id) == ((4L, 1L, 3L)), s"doc $id"))
    // s0 doc 5 has no boiler line: 3 lines, header+footer drop.
    assert(rows(5L) == ((3L, 1L, 2L)))
    // s1 docs: df=3 < 5 for header/footer — nothing drops.
    (10L until 13L).foreach(id => assert(rows(id) == ((3L, 3L, 0L)), s"doc $id"))
  }

  // ---- t46_bm25 ------------------------------------------------------

  /** Corpus where the BM25 ordering is hand-checkable: for query 1
    * ("customer table join"), doc 0 matches two terms, doc 1 one term
    * twice in a LONGER doc, doc 2 one term once, doc 3 none. With k1=1.2,
    * b=0.75 the two-distinct-term doc must outrank the repeated-term doc
    * (tf saturates), and the long doc is penalized vs a short doc with
    * the same tf.
    */
  private lazy val bm25Dir: String = {
    val dir = tmpDir("graft_scrub_bm25")
    val filler = (0 until 20).map(i => s"f$i").mkString(" ")
    Seq(
      (0L, "customer table alpha beta", "en", "s0"),
      (1L, s"customer customer $filler", "en", "s0"),
      (2L, "customer alpha beta gamma", "en", "s0"),
      (3L, "alpha beta gamma delta", "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t46 ranks two distinct terms above a repeated term, penalizes length") {
    val rows = Registry.byName("t46_bm25").run(spark, bm25Dir)
      .collect()
      .filter(_.getAs[Int]("query_id") == 1)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
    // Only docs 0-2 contain a query-1 term.
    assert(rows.map(_._1).toSeq == Seq(0L, 2L, 1L),
      s"unexpected ranking: ${rows.toSeq}")
    // Two distinct matched terms beat one term no matter the tf...
    assert(rows(0)._2 > rows(2)._2)
    // ...and the short single-term doc beats the long repeated-term doc
    // (length normalization + tf saturation).
    assert(rows(1)._2 > rows(2)._2)
    // Scores are positive and the idf is shared, so every score is finite.
    assert(rows.forall(_._2 > 0.0))
  }

  test("t45 kept_md5 preserves original line order") {
    val got = Registry.byName("t45_line_dedup").run(spark, lineDir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("kept_md5")).toMap
    // s1 doc 10 keeps all three lines in document order.
    val expected = Seq(
      "about s1 terms of use apply",
      (0 until 10).map(i => s"w10x$i").mkString(" "),
      "copyright s1 all rights reserved").mkString("\n")
    assert(got(10L) == md5hex(expected))
  }
}
