package graft.ops

import org.scalacheck.Gen

import graft.SparkSpec

/** Property check: the distributed min-label propagation must agree with a
  * sequential union-find oracle on arbitrary random graphs — a genuinely
  * independent second oracle next to d3's DuckDB recursive CTE, and one
  * that sweeps graph shapes (self-loops, parallel edges, disconnected
  * blobs, hubs, chains) no fixed fixture covers.
  */
class ComponentsPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Sequential union-find with path compression, min node id as the
    * canonical representative — written for obviousness, not speed.
    */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // Union by min id keeps the representative the component minimum.
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private val edgeGen: Gen[List[(Long, Long)]] = Gen.sized { _ =>
    for {
      nEdges <- Gen.choose(0, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, 39L)
        b <- Gen.choose(0L, 39L)
      } yield (a, b))
    } yield edges
  }

  test("labels agree with a sequential union-find on random graphs") {
    // A modest number of samples — every sample is a full Spark loop run,
    // so 12 diverse graphs beat 100 near-identical ones on wall-clock.
    val samples = Gen.listOfN(12, edgeGen).sample.get
    samples.foreach { edges =>
      // Self-loops are legal input (a doc paired with itself dedups to its
      // own cluster); drop nothing.
      val got = Components
        .connectedComponents(edges.toDF("d1", "d2"))
        .as[(Long, Long)].collect().toMap
      val want = oracle(edges)
      assert(got == want,
        s"edges=$edges\n got=$got\nwant=$want")
    }
  }
}
