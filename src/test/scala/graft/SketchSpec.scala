package graft

import org.apache.spark.sql.functions._

/** t40's Count-Min sketch contract on a constructed skewed corpus with
  * known true counts: the CM estimate must NEVER undercount (the one-sided
  * guarantee the sketch exists for), the top-10 ranking and exact counts
  * must match the plan, and a dense vocabulary (far more types than the
  * 4×64 cells) must still rank the planted heavy hitters first.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("CM estimates never undercount and heavy hitters surface") {
    // 300 distinct filler types (>> 64 buckets → guaranteed collisions)
    // plus two planted heavy hitters with known counts.
    val words =
      Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
        (0 until 300).map(i => s"w$i")
    val docs = words.grouped(30).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" "), "en", "src0") }
      .toSeq
    val dir = tmpDir("cm")
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Registry.byName("t40_countmin_heavy_hitters").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(out.length === 10)
    assert(out.head._1 === "alpha" && out.head._2 === 100L)
    assert(out(1)._1 === "beta" && out(1)._2 === 50L)
    out.foreach { case (tok, exact, est, over, _) =>
      assert(est >= exact, s"$tok undercounted: $est < $exact")
      assert(over === est - exact)
    }
    // fillers all have count 1, rank 3..10 is the lexicographic head
    assert(out.drop(2).map(_._1).toSeq ===
      (0 until 300).map(i => s"w$i").sorted.take(8))
  }
}
