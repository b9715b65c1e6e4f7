package graft

import org.apache.spark.sql.functions._

/** Invariants for t17 sequence packing and t26 repetition stats that the
  * hash oracle can't express: packing conservation/contiguity and a
  * from-scratch hand check of the repetition rule on one document.
  */
class TextPackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("t17 packing covers every doc once with contiguous in-bin positions") {
    val packed = Registry.byName("t17_seq_packing").run(spark, dir).cache()
    val nDocs = Tables.documents(spark, dir).count()
    assert(packed.count() == nDocs)
    assert(packed.select("doc_id").distinct().count() == nDocs)

    // bin ids start at 0 per lang; bin_pos is 1..k gap-free inside a bin.
    val badBins = packed.groupBy("lang", "bin_id")
      .agg(min("bin_pos").as("lo"), max("bin_pos").as("hi"),
        count(lit(1)).as("n"))
      .where(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(badBins.isEmpty, "in-bin positions are 1..n")
    val firstBins = packed.groupBy("lang").agg(min("bin_id").as("b0"))
      .where(col("b0") =!= 0)
    assert(firstBins.isEmpty, "every lang starts at bin 0")
  }

  test("t26 repetition stats match a hand check on one document") {
    val out = Registry.byName("t26_repetition_stats").run(spark, dir)
      .where(col("doc_id") === 0L).head()
    val text = Tables.documents(spark, dir)
      .where(col("doc_id") === 0L).select("text").head().getString(0)
    val toks = text.split(" ").toSeq
    val counts = toks.groupBy(identity).view.mapValues(_.size).toMap
    val topN = counts.values.max
    val topTok = counts.filter(_._2 == topN).keys.max
    assert(out.getAs[Long]("n_tokens") == toks.size.toLong)
    assert(out.getAs[Long]("n_distinct") == counts.size.toLong)
    assert(out.getAs[String]("top_tok") == topTok)
    val tr = topN.toDouble / toks.size
    assert(math.abs(out.getAs[Double]("top_tok_ratio") - BigDecimal(tr)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
