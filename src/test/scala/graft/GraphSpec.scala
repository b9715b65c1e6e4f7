package graft

import org.apache.spark.sql.functions._

/** Invariants for the co-purchase-graph queries (q32 triangles, q33
  * pagerank) that the hash oracle can't express: rank-mass conservation
  * and wedge/triangle consistency.
  */
class GraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q33 pagerank mass is conserved and strictly positive") {
    // With a symmetrized graph there are no dangling nodes, so total mass
    // stays exactly (1-d) + d * 1 = 1 each iteration (up to fp rounding).
    val ranks = Registry.byName("q33_pagerank").run(spark, dir).cache()
    val total = ranks.agg(sum("pr")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass $total")
    assert(ranks.where(col("pr") <= 0.0).isEmpty, "all ranks positive")
  }

  test("q32 triangle counts are consistent with wedge counts") {
    val r = Registry.byName("q32_triangle_count").run(spark, dir).head()
    val (edges, wedges, tris) =
      (r.getAs[Long]("n_edges"), r.getAs[Long]("n_wedges"),
        r.getAs[Long]("n_triangles"))
    assert(edges > 0)
    assert(tris <= wedges, "every triangle closes a wedge")
  }
}
