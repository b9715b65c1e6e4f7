package graft
import org.apache.spark.sql.SparkSession

/** Benchmark entrypoint. Times every registry query on
  * `SPARK_GRAFT_SF_DIR` at `local[SPARK_GRAFT_CPUS]` and prints ONE compact
  * JSON line `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":..}`.
  *
  * Methodology (round 5): one untimed warm pass per query, then
  * `SPARK_GRAFT_PASSES` (default 3) timed passes; the reported number is the
  * MEDIAN of the timed passes. Single-run artifacts proved to be the gate's
  * largest error bar — the round-4 driver capture showed d1_lsh_neardup at
  * 8.06 s purely from host noise (steady-state re-measures: 2.3-2.4 s); the
  * median of three collapses that noise without hiding real regressions.
  * Per-query min/max land in the `bench_latest.json` file artifact.
  */
object Bench {
  private def round3(v: Double): Double = math.rint(v * 1000) / 1000

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = Sessions.localBuilder(cpus)
    // Extra session confs for local experiments: SPARK_GRAFT_CONF="k=v;k=v".
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      builder.config(k, v)
    })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("SPARK_GRAFT_LOG", "WARN"))
    // Warm-up outside the timed region: JVM/codegen/parquet-reader init is
    // engine startup, not query cost.
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    // Local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 limits the set; unset
    // (the driver's mode) runs everything.
    // Empty segments (or an entirely empty value) mean "no filter",
    // matching the documented "unset runs everything" contract.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    // Named subset for cross-engine pairings (`runMain graft.Bench fullcomp`
    // or SPARK_GRAFT_SUBSET=fullcomp): the full-computation cut — t*/q*/
    // dash_*/e1–e4 — excludes the ~30 staged-intermediate oracles (which
    // replay Spark's own staged outputs on the DuckDB side) and the 9
    // streaming queries (micro-batch floors with no DuckDB equivalent), so
    // a Spark-vs-DuckDB total compares like for like. The matching DuckDB
    // side is `tools/duckdb_replay.py <sf> <outdir> 32 fullcomp`; recipe in
    // PERF.md.
    val subset: Option[String => Boolean] =
      args.headOption.filter(_.nonEmpty)
        .orElse(sys.env.get("SPARK_GRAFT_SUBSET")) match {
        case Some("fullcomp") => Some(n =>
          n.startsWith("t") || n.startsWith("q") || n.startsWith("dash_") ||
            Set("e1_knn_brute", "e2_label_centroids", "e3_vector_norms",
              "e4_embedding_neardup")(n))
        case Some(other) =>
          // Fail fast: a typo'd subset silently becoming a full-registry
          // total would poison a fullcomp comparison, and the warning is
          // easy to miss in driver output. Mirrored in duckdb_replay.py.
          System.err.println(s"[bench] unknown subset '$other' — aborting")
          sys.exit(2)
        case None => None
      }
    // Fail fast on a typo'd or out-of-subset SPARK_GRAFT_ONLY (same
    // discipline as the named subsets above and graft.Verify): names the
    // run would actually bench are keySet ∩ subset, and a filter naming
    // anything outside that set must abort loudly — never silently bench
    // an empty (or unexpectedly thinner) set.
    only.foreach { names =>
      val benchable = SparkEntry.queries.keySet
        .filter(n => subset.forall(_(n)))
      val unknown = names -- benchable
      if (unknown.nonEmpty) {
        System.err.println("[bench] SPARK_GRAFT_ONLY queries unknown or " +
          s"outside the active subset: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(2)
      }
    }
    // One untimed warm pass per query (codegen compilation + JIT are engine
    // warm-up, not query cost). Disable with SPARK_GRAFT_COLD=1 to measure
    // cold-start instead (which also drops to a single timed pass).
    val warmRuns = !sys.env.contains("SPARK_GRAFT_COLD")
    val passes =
      if (!warmRuns) 1
      else sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(3)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    def writeArtifact(rs: Seq[(String, (Double, Double, Double))],
        partial: Boolean): Unit = {
      val qs = rs.map { case (k, (med, _, _)) =>
        "\"" + k + "\":" + round3(med)
      }.mkString("{", ",", "}")
      val total = round3(rs.map(_._2._1).filter(_ >= 0).sum)
      val detail = rs.map { case (k, (med, mn, mx)) =>
        "\"" + k + "\":{\"median\":" + round3(med) + ",\"min\":" + round3(mn) +
          ",\"max\":" + round3(mx) + "}"
      }.mkString("{", ",", "}")
      val fileJson =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"stat":"median","partial":$partial,"detail":$detail}"""
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(out),
          (fileJson + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] could not write $out: ${e.getMessage}")
      }
    }
    val acc = scala.collection.mutable.ArrayBuffer
      .empty[(String, (Double, Double, Double))]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) && subset.forall(_(n)) }
      .map { case (name, fn) =>
        if (warmRuns) {
          try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        }
        val times = (1 to passes).map { _ =>
          // Each timed pass starts from a clean slate: no cached blocks left
          // behind by earlier queries/passes (their persist() calls would
          // otherwise squat on storage memory and make pass 2 measure cache
          // hits, not the engine) and no carried garbage — the GC runs
          // OUTSIDE the timed region so pass k doesn't pay for pass k-1's
          // allocations.
          spark.sharedState.cacheManager.clearCache()
          System.gc()
          // A failing pass reports -1, loudly — never its time-to-exception
          // masquerading as a legitimate duration.
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true } catch {
            case e: Throwable =>
              System.err.println(
                s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
              false
          }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        val r =
          if (times.contains(-1.0)) name -> (-1.0, -1.0, -1.0)
          else {
            val s = times.sorted
            name -> (s(s.length / 2), s.head, s.last) // (median, min, max)
          }
        // Checkpoint the artifact after EVERY query (marked partial): a
        // median-of-3 full-registry run takes ~10 min, and a run killed by
        // an external timeout should leave the completed per-query numbers
        // behind, not nothing.
        acc += r
        writeArtifact(acc.toSeq, partial = true)
        r
      }
    val qs = results.map { case (k, (med, _, _)) =>
      "\"" + k + "\":" + round3(med)
    }.mkString("{", ",", "}")
    val total = round3(results.map(_._2._1).filter(_ >= 0).sum)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"stat":"median"}"""
    // The compact line goes out FIRST (and is this program's primary stdout
    // output): the driver scrapes sbt's stdout and has truncated long tails
    // before — leading with the payload gives the scrape its best chance.
    println(json)
    // BENCH_r06 showed the driver keeps only a 2000-byte stdout TAIL and
    // parses from that — the full per-query line is 3.3+ KB (re-measured
    // r15: 3392 bytes for 133 queries), so it can never land intact
    // (`parsed: null` every round, truncated at the head). Print a
    // tail-sized summary LAST: same shape, total intact, `queries` trimmed
    // to the slowest entries that fit the window, and a pointer to the
    // committed full artifact. A parsed total beats a null.
    // Budget arithmetic (r15): 2000-byte tail − sbt's `[success] Total
    // time: ...` epilogue (~75 B) − the `[info] ` prefix + newlines (~10 B)
    // − this line's non-queries envelope (~170 B) leaves ≈1745 B for the
    // queries map; 1560 keeps a ~180-byte safety margin (a longer epilogue
    // must never truncate the line's head — a parsed 60-query line beats an
    // unparseable 133-query one). BENCH_r14 `parsed` carried 49 queries
    // inside the old 1200 budget; this lifts the driver's round-over-round
    // PERF coverage to the slowest ~62 without risking the parse.
    val slowest = results.filter(_._2._1 >= 0).sortBy(-_._2._1)
    val keptQs = new StringBuilder
    var used = 0
    var omitted = 0
    slowest.foreach { case (k, (med, _, _)) =>
      val ent = "\"" + k + "\":" + round3(med)
      if (used + ent.length <= 1560) {
        if (used > 0) keptQs.append(',')
        keptQs.append(ent); used += ent.length + 1
      } else omitted += 1
    }
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":{$keptQs},"queries_omitted":$omitted,"detail_file":"$out","sf":"$sfDir","passes":$passes,"stat":"median"}""")
    // Final durable copy with the full per-query spread (median/min/max
    // over the timed passes), partial=false — the stdout line stays in the
    // driver's expected {"queries":{name:sec}} shape.
    writeArtifact(results, partial = false)
    spark.stop()
  }
}
