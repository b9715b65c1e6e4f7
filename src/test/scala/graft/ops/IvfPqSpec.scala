package graft.ops

import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** e16's IVF-PQ composition: residual correctness against a plain-Scala
  * recompute, the rate-distortion claim (residual codebooks reconstruct
  * better than flat PQ at equal bytes), and end-to-end search recall vs
  * brute force through the full registry query on a planted-cluster corpus.
  */
class IvfPqSpec extends SparkSpec {

  import spark.implicits._

  /** Clustered 64-d vectors: k well-separated Gaussian clusters. */
  private def clustered(n: Int, k: Int = 4, dim: Int = 64) = {
    val rng = new scala.util.Random(11)
    val centers = Array.fill(k)(Array.fill(dim)(rng.nextGaussian() * 5))
    (0 until n).map { i =>
      val c = centers(i % k)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.4).toFloat).toSeq,
        i % k)
    }
  }

  test("residualsWithCells subtracts the argmax cell's centroid exactly") {
    val rows = clustered(60)
    val df = rows.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
    var cents = Similarity.sampleCentroids(df, "vec_id", "embedding", 4)
    cents = Similarity.kmeansStep(df, "embedding", cents)
    val got = Similarity.residualsWithCells(df, "vec_id", "embedding", cents)
      .collect()
      .map(r => r.getLong(1 - 1) -> (r.getInt(1), r.getSeq[Float](2)))
      .toMap
    val vecs = rows.map { case (id, v, _) => id -> v }.toMap
    vecs.foreach { case (id, v) =>
      // Reference assignment: argmax of dot(v, c) − ‖c‖²/2, ties → higher
      // cell (greatest()'s struct comparison picks the LAST max).
      val scores = cents.map(c =>
        v.zip(c).map { case (x, y) => x.toDouble * y }.sum -
          c.map(x => x * x).sum / 2)
      val cell = scores.zipWithIndex.maxBy { case (s, i) => (s, i) }._2
      val (gotCell, resid) = got(id)
      assert(gotCell === cell, s"vec $id assigned $gotCell, want $cell")
      resid.indices.foreach { i =>
        val want = (v(i).toDouble - cents(cell)(i)).toFloat
        assert(resid(i) === want, s"vec $id dim $i")
      }
    }
  }

  test("residual PQ reconstructs better than flat PQ at equal bytes") {
    val rows = clustered(200)
    val df = rows.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")
      .cache()
    var cents = Similarity.sampleCentroids(df, "vec_id", "embedding", 4)
    for (_ <- 0 until 2) cents = Similarity.kmeansStep(df, "embedding", cents)

    def mse(codes: Map[Long, Seq[Int]], cb: Array[Array[Array[Double]]],
        offset: Long => Array[Double]): Double = {
      val vecs = rows.map { case (id, v, _) => id -> v }.toMap
      val errs = codes.map { case (id, cs) =>
        val recon = cs.toArray.zipWithIndex.flatMap { case (c, m) => cb(m)(c) }
        val off = offset(id)
        vecs(id).zipWithIndex.map { case (x, i) =>
          val d = x.toDouble - (recon(i) + off(i)); d * d
        }.sum
      }
      errs.sum / errs.size
    }
    def collectCodes(coded: org.apache.spark.sql.DataFrame) =
      coded.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap

    val flatCb = Similarity.pqTrain(df, "vec_id", "embedding", 8, 16, 2)
    val flatCodes = collectCodes(
      Similarity.pqEncode(df, "vec_id", "embedding", flatCb))
    val zeroOff = Array.fill(64)(0.0)

    val resid = Similarity.residualsWithCells(df, "vec_id", "embedding",
      cents).cache()
    val cellOf = resid.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val resCb = Similarity.pqTrain(resid, "vec_id", "resid", 8, 16, 2)
    val resCodes = collectCodes(
      resid.select(col("vec_id"),
        graft.expressions.PqCodes(col("resid"), resCb).as("codes")))

    val flatMse = mse(flatCodes, flatCb, _ => zeroOff)
    val resMse = mse(resCodes, resCb, id => cents(cellOf(id)))
    assert(resMse < flatMse,
      s"residual PQ MSE $resMse should beat flat PQ MSE $flatMse")
    df.unpersist(); resid.unpersist()
  }

  test("e16 end-to-end search reaches high recall against brute force") {
    val rows = clustered(200, k = 16)
    val dir = tmpDir("ivfpq")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = rows.map { case (id, v, _) => (id, v) }.toDF("vec_id", "embedding")

    val exact = Similarity.bruteForceTopK(df,
        df.filter($"vec_id" < 20), "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Registry.byName("e16_ivfpq_ann").run(spark, dir)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF-PQ recall $recall below 0.8")
  }
}
