package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bloom-prefiltered incremental dedup must be byte-equivalent to the
  * plain anti join: the sketch is allowed false POSITIVES (caught by the
  * exact verify join) but a false negative would silently re-ingest a
  * duplicate — so the no-false-negative property is asserted directly on
  * the expression, and the end-to-end result against an exact-anti-join
  * oracle on data with real overlaps (which sf0.01 lacks).
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(ids: Seq[Long], texts: Seq[String]) =
    ids.zip(texts).toDF("doc_id", "text").withColumn("h", md5(col("text")))

  test("incrementalNew equals the exact anti join, dups and all") {
    val corpus = hashed(0L until 300L, (0 until 300).map(i => s"doc body $i"))
    // Batch: 40 exact dups of corpus docs + 60 genuinely new docs.
    val batch = hashed(
      1000L until 1100L,
      (0 until 40).map(i => s"doc body ${i * 7}") ++
        (0 until 60).map(i => s"fresh body $i"))

    val got = Dedup.incrementalNew(
        corpus.select("h"), batch.select("doc_id", "h"), "h",
        expectedItems = 300)
      .select("doc_id").as[Long].collect().sorted
    val want = batch.join(corpus.select("h"), Seq("h"), "left_anti")
      .select("doc_id").as[Long].collect().sorted

    assert(want.length == 60)
    assert(got.toSeq == want.toSeq)
  }

  test("bloom probe has no false negatives over every inserted key") {
    val corpus = hashed(0L until 500L, (0 until 500).map(i => s"k$i"))
      .select("h")
    val bloom = corpus.stat.bloomFilter("h", 500, 0.01)
    val misses = corpus
      .filter(!graft.expressions.BloomMightContain(col("h"), bloom))
      .count()
    assert(misses == 0L, "a bloom false negative would drop a true duplicate")
  }

  test("bloom-negative rows bypass the verify join as proven-new") {
    // All-new batch: with fpp=0.01 over 100 probes, the verify side should
    // be (near-)empty — the scale property. We can't assert exact counts
    // (fpp is probabilistic), but every batch row must still come back.
    val corpus = hashed(0L until 200L, (0 until 200).map(i => s"old $i"))
    val batch = hashed(500L until 600L, (0 until 100).map(i => s"new $i"))
    val got = Dedup.incrementalNew(
      corpus.select("h"), batch.select("doc_id", "h"), "h", expectedItems = 200)
    assert(got.count() == 100L)
  }
}
