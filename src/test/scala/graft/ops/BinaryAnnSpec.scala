package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** e14's binary sign-quantization kernel ([[Similarity.signPack]] /
  * [[Similarity.binaryTopK]]): the packed-word Hamming distance must equal
  * the per-dimension sign-disagreement count computed by an independent
  * plain-Scala reference (no bit packing at all), and the packing itself
  * must be exhaustive over bit positions.
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

  private def pack(vecs: Seq[(Long, Seq[Float])]): Map[Long, (Long, Long)] =
    Similarity.signPack(vecs.toDF("vec_id", "embedding"), "vec_id",
      "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("packed-word Hamming equals per-dimension sign disagreement") {
    val vecs = (0L until 12L).map(i => (i, rnd(i.toInt)))
    val words = pack(vecs)
    val lookup = vecs.toMap
    for (a <- 0L until 12L; b <- 0L until 12L) {
      val (aw0, aw1) = words(a)
      val (bw0, bw1) = words(b)
      val viaWords =
        java.lang.Long.bitCount(aw0 ^ bw0) + java.lang.Long.bitCount(aw1 ^ bw1)
      assert(viaWords === refHamming(lookup(a), lookup(b)), s"pair ($a,$b)")
    }
  }

  test("binaryTopK ranks by the reference Hamming with cid tie-breaks") {
    val vecs = (0L until 30L).map(i => (i, rnd(100 + i.toInt)))
    val packed = Similarity.signPack(
      vecs.toDF("vec_id", "embedding"), "vec_id", "embedding")
    val got = Similarity.binaryTopK(
        packed, packed.filter(col("vec_id") < 3), "vec_id", 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))
    val lookup = vecs.toMap
    val want = (0L until 3L).flatMap { q =>
      (0L until 30L).filter(_ != q)
        .map(c => (q, c, refHamming(lookup(q), lookup(c))))
        .sortBy { case (_, c, h) => (h, c) }
        .take(4).zipWithIndex
        .map { case ((qq, c, h), i) => (qq, c, h, i + 1) }
    }
    assert(got.toSeq === want)
  }

  test("packing covers all 64 dimensions with distinct bit positions") {
    // A one-hot positive vector must set exactly one bit, and all 64
    // one-hot vectors must land on 64 DISTINCT (word, bit) positions.
    val oneHots = (0 until 64).map { d =>
      (d.toLong, Seq.tabulate(64)(i => if (i == d) 1f else -1f))
    }
    val words = pack(oneHots)
    // .toSeq first: mapping a Map to (w0, w1) pairs would re-key by w0 and
    // collapse the 32 high-word entries (all w0 = 0) into one.
    val positions = words.toSeq.map { case (id, (w0, w1)) =>
      assert(java.lang.Long.bitCount(w0) + java.lang.Long.bitCount(w1) === 1,
        s"vec $id set ${java.lang.Long.bitCount(w0) + java.lang.Long.bitCount(w1)} bits")
      (w0, w1)
    }.toSet
    assert(positions.size === 64)
  }

  test("zero components quantize to the 0 bit on both ends of a tie") {
    // x > 0 (not >= 0): exact zeros must pack identically to negatives so
    // Spark and the DuckDB oracle agree on float ties.
    val words = pack(Seq(
      (0L, Seq.fill(64)(0f)),
      (1L, Seq.fill(64)(-1f))))
    words.values.foreach { case (w0, w1) =>
      assert(w0 === 0L && w1 === 0L)
    }
  }
}
