package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** e14's binary sign-quantization kernel: the packed-word Hamming distance
  * must equal the per-dimension sign-disagreement count computed by an
  * independent plain-Scala reference (no bit packing at all), and the
  * packing itself must be exhaustive over bit positions.
  */
class BinaryAnnSpec extends SparkSpec {

  import spark.implicits._

  /** Reference: count dims where the sign bit (x > 0) disagrees. */
  private def refHamming(a: Seq[Float], b: Seq[Float]): Int =
    a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }

  private def rnd(seed: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(64)((r.nextFloat() - 0.5f) * 4f)
  }

  private val packed = {
    val vecs = (0L until 12L).map(i => (i, rnd(i.toInt)))
    val df = vecs.toDF("vec_id", "embedding")
    val signWord = (off: Int) =>
      (0 until 32).map { i =>
        when(element_at(col("embedding"), off + i + 1) > lit(0f), lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    val words = df.select(col("vec_id"), signWord(0).as("w0"),
      signWord(32).as("w1"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (vecs.toMap, words)
  }

  test("packed-word Hamming equals per-dimension sign disagreement") {
    val (vecs, words) = packed
    for (a <- 0L until 12L; b <- 0L until 12L) {
      val (aw0, aw1) = words(a)
      val (bw0, bw1) = words(b)
      val viaWords =
        java.lang.Long.bitCount(aw0 ^ bw0) + java.lang.Long.bitCount(aw1 ^ bw1)
      assert(viaWords === refHamming(vecs(a), vecs(b)),
        s"pair ($a,$b)")
    }
  }

  test("packing covers all 64 dimensions with distinct bit positions") {
    // A one-hot positive vector must set exactly one bit, and all 64
    // one-hot vectors must land on 64 DISTINCT (word, bit) positions.
    val oneHots = (0 until 64).map { d =>
      (d.toLong, Seq.tabulate(64)(i => if (i == d) 1f else -1f))
    }
    val df = oneHots.toDF("vec_id", "embedding")
    val signWord = (off: Int) =>
      (0 until 32).map { i =>
        when(element_at(col("embedding"), off + i + 1) > lit(0f), lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    val rows = df.select(col("vec_id"), signWord(0).as("w0"),
      signWord(32).as("w1")).collect()
    val positions = rows.map { r =>
      val (w0, w1) = (r.getLong(1), r.getLong(2))
      assert(java.lang.Long.bitCount(w0) + java.lang.Long.bitCount(w1) === 1,
        s"vec ${r.getLong(0)} set ${java.lang.Long.bitCount(w0) + java.lang.Long.bitCount(w1)} bits")
      (w0, w1)
    }.toSet
    assert(positions.size === 64)
  }

  test("zero components quantize to the 0 bit on both ends of a tie") {
    // x > 0 (not >= 0): exact zeros must pack identically to negatives so
    // Spark and the DuckDB oracle agree on float ties.
    val df = Seq(
      (0L, Seq.fill(64)(0f)),
      (1L, Seq.fill(64)(-1f))).toDF("vec_id", "embedding")
    val signWord = (off: Int) =>
      (0 until 32).map { i =>
        when(element_at(col("embedding"), off + i + 1) > lit(0f), lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    val rows = df.select(signWord(0).as("w0"), signWord(32).as("w1"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(0) === 0L)
      assert(r.getLong(1) === 0L)
    }
  }
}
