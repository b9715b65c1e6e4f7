package graft

/** Plan-shape regression gate: the properties that make these queries
  * survive a 100× scale-up, asserted against the REAL registry plans at
  * sf0.001 so a refactor that silently reintroduces a full scan, a
  * cartesian product, or an extra shuffle chain fails here — not in a
  * production-size run. PLANS.md snapshots the same fingerprints for
  * humans; this spec is the executable subset.
  */
class PlanSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def fp(name: String) =
    PlanAudit.fingerprint(Registry.byName(name).run(spark, Sf))

  test("point read pushes its subject predicate into the parquet scan") {
    assert(fp("dash_hypnogram").pushedFilters >= 1,
      "dash_hypnogram must push the user_id filter to the events scan")
  }

  test("sleep-family models reuse one subject partitioning over the staged base") {
    Seq("sleep_metrics", "sleep_summary", "sleep_features").foreach { q =>
      val f = fp(q)
      assert(f.exchanges <= 3, s"$q shuffles ${f.exchanges}×, want ≤3")
    }
  }

  test("dedup / ANN / interval paths never plan a quadratic join") {
    Seq("d1_lsh_neardup", "d2_simhash_neardup", "e4_embedding_neardup",
      "e5_lsh_ann", "e6_ivf_ann", "q19_interval_join").foreach { q =>
      val f = fp(q)
      assert(f.cartesian == 0, s"$q plans a CartesianProduct")
      assert(f.bnlj == 0, s"$q plans a BroadcastNestedLoopJoin")
    }
  }

  test("brute-force rerank baseline stays a broadcast, not a shuffle product") {
    // e1's all-pairs scoring is deliberate: tiny query side broadcast into
    // a streamed nested-loop — the exact-rerank shape. It must not degrade
    // to a shuffled cartesian.
    val f = fp("e1_knn_brute")
    assert(f.bnlj == 1 && f.cartesian == 0,
      s"e1 wants exactly one broadcast NLJ, got $f")
  }
}
