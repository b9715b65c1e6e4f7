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

  test("AQE posture is pinned: fingerprints hold under adaptive defaults") {
    // Every exchange-count and join-strategy assertion in this suite (and
    // every row in PLANS.md) is taken under Spark 4's DEFAULT adaptive
    // posture: AQE on, skew-join splitting on, post-shuffle partition
    // coalescing on. That posture is also the 100×-scale story — skewed
    // dedup/join keys re-plan at runtime instead of stalling one reducer.
    // Assert it explicitly so a config drift (a test helper or build flag
    // flipping AQE off) can't silently invalidate the fingerprints while
    // the assertions keep passing against a different engine mode.
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true",
      "plan fingerprints are only meaningful with AQE on")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "skew-join splitting must stay on — it is the skew story at scale")
    assert(
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true",
      "partition coalescing must stay on for the small-shuffle floors")
  }

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

  test("connected-components round plan is constant across rounds") {
    // The d3 loop's recurring unit: both inputs are eager localCheckpoints,
    // so round k's plan must not depend on k. This is the executable guard
    // against the round-2 lineage regression (un-truncated plans doubled
    // every round: 240 s on a 477-node graph). Drive two real rounds and
    // assert the NEXT round's pre-checkpoint plan has the same fingerprint
    // and the same plan size as the first round's.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val edges = (0L until 11L).map(i => (i, i + 1)).toDF("src", "dst")
      .localCheckpoint(true)
    val labels0 = edges.select(col("src").as("node"))
      .union(edges.select(col("dst"))).distinct()
      .withColumn("label", col("node")).localCheckpoint(true)

    // Join strategy may flip between broadcast and SMJ round-to-round (the
    // checkpoint scan's stats are estimates) — both are fine at their
    // scale. What must hold for ANY k: the plan stays the three-operator
    // round (≤ a handful of exchanges), never a quadratic join, and its
    // SIZE is bounded — the round-2 regression doubled the plan every
    // round, so even two extra rounds would triple the plan string here.
    val rounds = Iterator.iterate(labels0) { l =>
      graft.ops.Components.propagationRound(edges, l).localCheckpoint(true)
    }.drop(1).take(3).toSeq
    val plans = rounds.map(l => graft.ops.Components.propagationRound(edges, l))
    val sizes = plans.map(_.queryExecution.executedPlan.toString.length)
    assert(sizes.max < sizes.min * 2,
      s"round plan size is growing with the round number: $sizes")
    plans.map(PlanAudit.fingerprint).foreach { f =>
      assert(f.cartesian == 0 && f.bnlj == 0, s"quadratic join in a round: $f")
      assert(f.exchanges <= 5, s"round shuffles ${f.exchanges}×, want ≤5")
    }
  }

  test("quantized top-k keeps e1's deliberate broadcast scan shape") {
    // e7 scores int8 vectors with the same broadcast-queries × streamed-
    // corpus topology as e1; it must not degrade to a shuffled cartesian,
    // and its quantization pass must not add shuffles beyond the stage
    // write + final sort.
    val f = fp("e7_quantized_ann")
    assert(f.bnlj == 1 && f.cartesian == 0,
      s"e7 wants exactly one broadcast NLJ, got $f")
    assert(f.exchanges <= 2, s"e7 wants ≤2 exchanges, got $f")
  }

  test("streaming read-backs stay a single output sort") {
    // s1–s3's stateful work happens inside the streaming runtime; the
    // registry-visible plan is the sink read-back and must stay one range
    // exchange — more means post-processing crept into the batch side.
    Seq("s1_stream_windows", "s2_stream_sessions", "s3_stream_enrich")
      .foreach { q =>
        val f = fp(q)
        assert(f.exchanges <= 1, s"$q wants ≤1 exchange, got $f")
        assert(f.cartesian == 0 && f.bnlj == 0, s"quadratic join in $q: $f")
      }
  }

  test("ranking cuts never sort the corpus through one task") {
    // e8's three top-k cuts are TakeOrderedAndProject + a window over the
    // k survivors; t32's corpus-wide pick_rank is Ranks.globalRowNumber
    // (range-sort + zipWithIndex). Neither may plan an un-partitioned
    // WindowExec whose input reaches a scan without passing a limit —
    // that shape funnels the whole scored corpus through one task.
    Seq("e8_hybrid_search", "t32_dsir_weights", "e1_knn_brute",
      "q14_top_customers_per_nation", "t37_bpe_apply").foreach { q =>
      val df = Registry.byName(q).run(spark, Sf)
      assert(PlanAudit.unpartitionedCorpusWindows(df) == 0,
        s"$q plans a corpus-global un-partitioned window")
    }
  }

  test("binary ANN keeps the broadcast scan shape over packed words") {
    // e14 is the e1/e7 topology over 16-byte packed rows: exactly one
    // broadcast NLJ (queries into the streamed corpus), no product, and
    // no shuffle beyond the rank-window + output sort.
    val f = fp("e14_binary_ann")
    assert(f.bnlj == 1 && f.cartesian == 0,
      s"e14 wants exactly one broadcast NLJ, got $f")
    assert(f.exchanges <= 2, s"e14 wants ≤2 exchanges, got $f")
  }

  test("spectral diagnostics never join the corpus with itself") {
    // e15's covariance is chained generators + one keyed shuffle — a
    // self-join or product here would square the N·d² generate volume.
    // The d² matrix and the PC1 vector ride broadcasts back.
    val f = fp("e15_pca_power")
    assert(f.cartesian == 0 && f.smj == 0,
      s"e15 must not shuffle-join or product-join the flattened corpus: $f")
    assert(f.exchanges <= 4, s"e15 wants ≤4 exchanges, got $f")
  }

  test("spelling variants plan the deletion join, not the quadratic self-join") {
    // t39 exists to AVOID the O(V²) vocabulary self-join its oracle runs;
    // every join must be keyed (variant string / token), never a product.
    val f = fp("t39_spell_variants")
    assert(f.cartesian == 0 && f.bnlj == 0,
      s"t39 plans a quadratic join: $f")
  }

  test("count-min sketch ranks above an aggregate, never the raw corpus") {
    val f = fp("t40_countmin_heavy_hitters")
    assert(f.cartesian == 0 && f.bnlj == 0, s"t40 plans a product: $f")
    val df = Registry.byName("t40_countmin_heavy_hitters").run(spark, Sf)
    assert(PlanAudit.unpartitionedCorpusWindows(df) == 0,
      "t40's top-10 window must sit above the vocab aggregate")
  }

  test("salted skew aggregation is a bounded two-stage shuffle chain") {
    // q22's whole point: a hot key is split across salts (stage 1 shuffle),
    // then merged (stage 2 shuffle); the final orderBy adds a range
    // exchange. Any plan with more exchanges than that has lost the
    // pre-aggregation and would re-concentrate the hot key at scale.
    val f = fp("q22_salted_skew_agg")
    assert(f.exchanges <= 3, s"q22 wants ≤3 exchanges (salt, merge, order), got $f")
  }

  test("document chunking never shuffles the corpus") {
    // t12 is generate-only (posexplode over substring bounds) + the output
    // ordering; a shuffle beyond the final range exchange means chunking
    // started moving document bodies between executors.
    val f = fp("t12_chunking")
    assert(f.exchanges <= 1, s"t12 wants ≤1 exchange (output order only), got $f")
  }

  test("decontamination touches the train corpus in one broadcast pass") {
    // t19's eval side is a fixed benchmark suite — small by construction —
    // so the contamination probe must be a broadcast hash join into the
    // train scan. An SMJ here means the 100 TB train corpus gets shuffled
    // on the shingle key just to answer a membership probe.
    val f = fp("t19_decontamination")
    assert(f.bhj >= 1 && f.smj == 0,
      s"t19 wants the eval-shingle set broadcast (bhj>=1, smj=0), got $f")
    assert(f.cartesian == 0 && f.bnlj == 0, s"t19 plans a product: $f")
  }

  test("PII scrub is a pure projection — no shuffle before the output sort") {
    // t44 is codegen'd regexp column work per row; the only exchange
    // allowed is the final range sort. A join or aggregate creeping in
    // would mean the masking pass started moving document bodies.
    val f = fp("t44_pii_scrub")
    assert(f.exchanges <= 1, s"t44 wants ≤1 exchange (output order), got $f")
    assert(f.bhj + f.smj + f.bnlj + f.cartesian == 0,
      s"t44 must plan no joins at all, got $f")
  }

  test("line dedup keeps keyed shuffles only — no products on the line table") {
    // t45's profile is explode → (source, line) frequency agg → keyed join
    // back → per-doc re-agg → sort. All shuffles are keyed; any
    // cartesian/BNLJ would blow up in the 100 TB line table.
    val f = fp("t45_line_dedup")
    assert(f.cartesian == 0 && f.bnlj == 0, s"t45 plans a product: $f")
  }

  test("BM25 shuffles panel postings, broadcasts the panel and the stats row") {
    // t46's scale contract: the panel-term filter runs BEFORE the tf
    // groupBy (only matching postings shuffle), the 9-row panel joins as a
    // broadcast hash join, and the 1-row corpus stats ride a broadcast
    // NLJ. A shuffled panel join or a second scalar product means the
    // inverted-index access path degraded to corpus motion.
    val f = fp("t46_bm25")
    assert(f.cartesian == 0, s"t46 plans a cartesian product: $f")
    assert(f.bhj >= 1, s"t46 wants the panel broadcast-joined, got $f")
    assert(f.bnlj <= 1,
      s"t46 allows only the 1-row stats broadcast NLJ, got $f")
  }

  test("domain caps rank-filter in the plan — one domain shuffle, no joins") {
    // t47's cap must be a row_number window on the domain key feeding the
    // rollup — never a per-domain collect or a self-join. Plan contract:
    // a Window node present, zero joins of any kind, and ≤3 exchanges
    // (domain hash for the window+rollup, the ≤40-row share window's
    // single partition, the output sort).
    val q = Registry.byName("t47_domain_caps").run(spark, Sf)
    val plan = q.queryExecution.executedPlan.toString()
    assert(plan.contains("Window"), "t47 must cap via a window rank-filter")
    val f = fp("t47_domain_caps")
    assert(f.bhj + f.smj + f.bnlj + f.cartesian == 0,
      s"t47 must plan no joins at all, got $f")
    assert(f.exchanges <= 3, s"t47 wants ≤3 exchanges, got $f")
  }

  test("video near-dup joins hashes only — no products, broadcast verify") {
    // m7's verify joins move 12-byte frame-hash rows; the staged pair and
    // hash tables are small enough to broadcast at any sf, and nothing may
    // plan a product (a cartesian here would be pixels × pixels at scale).
    val f = fp("m7_video_neardup")
    assert(f.cartesian == 0 && f.bnlj == 0, s"m7 plans a product: $f")
  }

  test("gap-fill touches the raw corpus in exactly one aggregate shuffle") {
    // q38: events shuffle ONCE to the (user, day) grain; the span/grid/
    // fill chain then works at output grain (grid join + fill window +
    // output sort — these exchanges carry grid rows, never raw events).
    // No products: the grid join must stay keyed on (user, day).
    val f = fp("q38_gapfill_resample")
    assert(f.exchanges <= 3,
      s"q38 wants ≤3 exchanges (daily agg, grid/fill, sort), got $f")
    assert(f.cartesian == 0 && f.bnlj == 0, s"q38 plans a product: $f")
  }

  test("hot-path projections execute inside whole-stage codegen") {
    // Fingerprints above read the PRE-execution plan, where AQE hasn't
    // assigned codegen ids yet (codegenSpans always 0). This runs the
    // plan and reads the FINAL adaptive plan: the pure-projection scans
    // (PII masking, staging casts, token stats) must land inside at least
    // one WholeStageCodegen span — a codegen-incompatible expression
    // creeping into these paths would drop the whole scan to interpreted
    // eval and show up here as zero spans.
    Seq("t44_pii_scrub", "sleep_staging", "t2_token_stats").foreach { q =>
      val f = PlanAudit.executedFingerprint(Registry.byName(q).run(spark, Sf))
      assert(f.codegenSpans >= 1,
        s"$q executed with ZERO whole-stage-codegen spans: $f")
    }
  }

  test("mixture sampling moves the corpus once") {
    // t21: per-source stats + the 1-row weight total are broadcast back;
    // the corpus itself is touched by exactly one window shuffle (rank
    // within source) — everything else is sketch-sized. The scalar total
    // rides a 1-row broadcast NLJ (intended); no shuffled join allowed.
    val f = fp("t21_mixture_sampling")
    assert(f.smj == 0 && f.cartesian == 0,
      s"t21 must not shuffle-join or product-join the corpus, got $f")
    assert(f.bnlj <= 1, s"t21 allows only the 1-row scalar broadcast, got $f")
  }
}
