package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.ChunkJoin

/** The native chunker must be BYTE-IDENTICAL to the declarative HOF
  * spelling it replaced (t45's oracle parity depends on it): same chunks,
  * same short final chunk, same empty-input edge, across widths and
  * adversarial token shapes (empty tokens, single token, len % width == 0).
  */
class ChunkSpec extends SparkSpec {

  import spark.implicits._

  private def declarative(width: Int) = {
    val tk = split(col("text"), " ")
    val n = ceil(size(tk) / lit(width.toDouble)).cast("int")
    transform(sequence(lit(0), n - 1),
      i => array_join(slice(tk, i * width + 1, lit(width)), " "))
  }

  test("chunk_join equals the transform/slice/array_join spelling") {
    val texts = Seq(
      "",                                        // -> [""] (split yields one empty token)
      "a",
      "a b c d e f g h i j",                     // exactly one width-10 chunk
      "a b c d e f g h i j k",                   // 10 + 1
      (1 to 95).map(i => s"w$i").mkString(" "),  // 9 full + short tail
      (1 to 100).map(i => s"w$i").mkString(" ")) // len % width == 0
    val df = texts.toDF("text")
    Seq(1, 3, 10).foreach { w =>
      val rows = df.select(
        ChunkJoin(split(col("text"), " "), w).as("native"),
        declarative(w).as("decl")).collect()
      rows.zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"width=$w text='${t.take(30)}...'")
      }
    }
  }

  test("chunk_join null propagates and empty array yields empty array") {
    val df = Seq(Option(Seq("a", "b")), None, Option(Seq.empty[String]))
      .toDF("tk")
    val got = df.select(ChunkJoin(col("tk"), 10).as("c")).collect()
    assert(got(0).getSeq[String](0) == Seq("a b"))
    assert(got(1).isNullAt(0))
    assert(got(2).getSeq[String](0) == Seq.empty[String])
  }
}
