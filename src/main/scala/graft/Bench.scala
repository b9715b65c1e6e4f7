package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Pinned UTC so events.ts NTZ→timestamp conversion (Tables.events) is
      // zone-independent even when launched outside sbt's javaOptions.
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
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
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Steady-state methodology: one untimed warm pass per query (codegen
    // compilation + JIT are engine warm-up, not query cost), then clear all
    // DATA caches so the timed pass recomputes every byte — persisted
    // intermediates re-materialize inside the timed region. Disable with
    // SPARK_GRAFT_COLD=1 to measure cold-start instead.
    val warmRuns = !sys.env.contains("SPARK_GRAFT_COLD")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (name, fn) =>
        if (warmRuns) {
          try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        }
        // Each timed pass starts from a clean slate: no cached blocks left
        // behind by earlier queries (their persist() calls would otherwise
        // squat on storage memory for the rest of the run) and no carried
        // garbage — the GC runs OUTSIDE the timed region so query k doesn't
        // pay for query k-1's allocations.
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        // A failing query reports -1, loudly — never its time-to-exception
        // masquerading as a legitimate duration.
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(
              s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Also persist to a file: the stdout line is one huge JSON blob that log
    // scrapers (sbt) have truncated before — the file is the durable copy.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_latest.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
