package graft.ops

import graft.SparkSpec

/** q37_zorder_layout's locality contract: bucketing by the Morton key's top
  * 4 bits fixes the top 2 bits of EACH 8-bit dimension, so every bucket is
  * a 64×64 axis-aligned box — the property that makes min/max file stats
  * prune scans on either dimension. Verified on real testdata, plus a
  * bit-twiddling reference check of the interleave itself.
  */
class ZorderSpec extends SparkSpec {

  /** Reference Morton interleave — independent spelling (BigInt bit ops). */
  private def mortonRef(x: Long, y: Long): Long =
    (0 until 8).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("per-bucket spans stay inside the 64x64 box on real data") {
    val rows = graft.queries.RelationalQueries.q37
      .run(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val bucket = r.getAs[Long]("bucket")
      assert(bucket >= 0 && bucket < 16)
      assert(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") <= 63,
        s"bucket $bucket x-span exceeds the z-order box")
      assert(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") <= 63,
        s"bucket $bucket y-span exceeds the z-order box")
      // The bucket id IS the morton prefix: every key in the bucket shares it.
      assert(r.getAs[Long]("morton_min") >> 12 == bucket)
      assert(r.getAs[Long]("morton_max") >> 12 == bucket)
    }
  }

  test("the column expression matches the bit-twiddling reference") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pts = Seq((0L, 0L), (255L, 255L), (1L, 0L), (0L, 1L), (170L, 85L),
      (129L, 64L))
    def morton(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      (0 until 8).map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }.reduce(_ bitwiseOR _)
    val got = pts.toDF("x", "y")
      .select(morton(col("x"), col("y"))).as[Long].collect().toSeq
    assert(got == pts.map { case (x, y) => mortonRef(x, y) })
  }
}
