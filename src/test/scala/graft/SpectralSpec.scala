package graft

import org.apache.spark.sql.functions._

/** e15_pca_power's spectral math, checked on a CONSTRUCTED anisotropic
  * corpus where the answer is known: vectors are ±2·u + small noise for a
  * fixed unit direction u, so PC1 must align with u (explained-variance
  * ratio near 1) and the two labels must project to well-separated means
  * with opposite signs. The registry oracle proves Spark↔DuckDB agreement
  * on the real table; this spec proves the agreed-on number is the RIGHT
  * number.
  */
class SpectralSpec extends SparkSpec {

  import spark.implicits._

  test("power iteration recovers a planted dominant direction") {
    val dim = 8
    val r = new scala.util.Random(42)
    val u = {
      val raw = Array.fill(dim)(r.nextGaussian())
      val n = math.sqrt(raw.map(x => x * x).sum)
      raw.map(x => x / n)
    }
    val rows = (0 until 80).map { k =>
      val sign = if (k % 2 == 0) 2.0 else -2.0
      val vec = u.map(x => (sign * x + 0.05 * r.nextGaussian()).toFloat).toSeq
      (k.toLong, vec, k % 2)
    }
    val dir = tmpDir("spectral")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val out = Registry.byName("e15_pca_power").run(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getDouble(4), r.getDouble(5)))
      .sortBy(_._1)
    assert(out.length === 2)
    val Seq((_, n0, mean0, lam, ratio), (_, n1, mean1, _, _)) = out.toSeq
    assert(n0 === 40L && n1 === 40L)
    // planted component dominates: ±2 on one axis vs 0.05 noise
    assert(ratio > 0.9, s"explained ratio $ratio")
    assert(lam > 3.0, s"lambda $lam") // var of ±2 signal ≈ 4
    // labels separate on PC1 with opposite signs (global sign is free)
    assert(mean0 * mean1 < 0, s"means $mean0 / $mean1 must oppose")
    assert(math.abs(mean0) > 1.5 && math.abs(mean1) > 1.5)
  }

  test("isotropic noise shows no dominant direction") {
    val dim = 8
    val r = new scala.util.Random(7)
    val rows = (0 until 200).map { k =>
      (k.toLong, Array.fill(dim)(r.nextGaussian().toFloat).toSeq, k % 2)
    }
    val dir = tmpDir("spectral_iso")
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Registry.byName("e15_pca_power").run(spark, dir).collect()
    val ratio = out.head.getDouble(5)
    // 8 iid dimensions: top eigenvalue ratio stays near 1/8, far from 1
    assert(ratio > 0.05 && ratio < 0.5, s"explained ratio $ratio")
  }
}
