package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.warehouse.Warehouse

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private def epoch(subject: Int, idx: Int, stage: String = "N2",
      delta: Double = 15.0) =
    SleepEpoch(subject, idx, stage, delta, 14.2, 8.0, 1.2, 2.5)

  test("valid rows pass the contract") {
    val df = Seq(epoch(1, 100)).toDF()
    assert(Validation.epochContractViolations(df).count() == 0)
  }

  test("NaN power rejects the whole subject, healthy subjects survive") {
    val df = Seq(
      epoch(1, 0), epoch(1, 1, delta = Double.NaN),
      epoch(2, 0), epoch(2, 1)).toDF()
    val (valid, errors) = Validation.validateBySubject(df)
    assert(valid.select("subject_id").distinct().as[Int].collect().toSet == Set(2))
    val err = errors.collect()
    assert(err.length == 1 && err(0).getAs[Int]("subject_id") == 1)
    assert(err(0).getAs[String]("error_type") == "SchemaErrors")
  }

  test("invalid stage label is a violation; negative dB is not") {
    val bad = Seq(epoch(1, 0, stage = "SLEEPING")).toDF()
    assert(Validation.epochContractViolations(bad).count() == 1)
    val negative = Seq(epoch(1, 0, delta = -5.5)).toDF()
    assert(Validation.epochContractViolations(negative).count() == 0)
  }

  test("requireAll throws on the first failing check (fail-fast V7)") {
    val staged = graft.sleep.SleepModels.staging(
      Seq(epoch(1, 0), epoch(1, 0)).toDF()) // duplicate epoch_id
    val e = intercept[IllegalStateException] {
      Validation.requireAll(Validation.stagingChecks(staged))
    }
    assert(e.getMessage.contains("staging_unique_epoch_id"))
  }
}

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def epochs(subject: Int, n: Int, tag: Double = 0.0) =
    (0 until n).map(i =>
      SleepEpoch(subject, i, "N2", 15.0 + tag, 14.2, 8.0, 1.2, 2.5)).toDF()

  test("per-subject dynamic overwrite replaces only that subject (D1)") {
    val wh = new Warehouse(spark, tmpDir("wh"))
    wh.loadEpochs(epochs(1, 10).union(epochs(2, 20)))
    assert(wh.readEpochs().count() == 30)

    // Reload subject 1 with different content; subject 2 untouched.
    wh.loadEpochs(epochs(1, 5, tag = 1.0))
    val after = wh.readEpochs()
    assert(after.filter($"subject_id" === 1).count() == 5)
    assert(after.filter($"subject_id" === 2).count() == 20)
    assert(after.filter($"subject_id" === 1)
      .head().getAs[Double]("delta_power") == 16.0)
  }

  test("append mode keeps existing rows (D2)") {
    val wh = new Warehouse(spark, tmpDir("wh-append"))
    wh.loadEpochs(epochs(1, 10))
    wh.loadEpochs(epochs(1, 10), overwrite = false)
    assert(wh.readEpochs().count() == 20)
  }

  test("truncate removes everything (D3)") {
    val wh = new Warehouse(spark, tmpDir("wh-trunc"))
    wh.loadEpochs(epochs(1, 10))
    wh.truncateEpochs()
    intercept[Exception](wh.readEpochs().count()) // path gone = empty table
  }

  test("error log rows get uuid and timestamp defaults (D4)") {
    val wh = new Warehouse(spark, tmpDir("wh-err"))
    wh.logErrors(Seq(
      IngestError(7, "FileNotFoundError", "missing PSG", "trace...")).toDF())
    val rows = wh.readErrors().collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("error_id").matches(
      "[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}"))
    assert(r.getAs[java.sql.Timestamp]("occurred_at") != null)
    assert(r.getAs[Int]("subject_id") == 7)
  }

  test("load timestamps are populated (SLEEP_EPOCHS default)") {
    val wh = new Warehouse(spark, tmpDir("wh-ts"))
    wh.loadEpochs(epochs(3, 2))
    assert(wh.readEpochs().filter($"load_timestamp".isNull).count() == 0)
  }

  test("compaction collapses per-load small files, rows identical") {
    val wh = new Warehouse(spark, tmpDir("wh-compact"))
    // Ten incremental appends per subject — the small-file pathology: each
    // append leaves its own file(s) in every partition directory.
    (0 until 10).foreach { i =>
      wh.loadEpochs(epochs(1, 3, tag = i).union(epochs(2, 3, tag = i)),
        overwrite = i == 0)
    }
    val before = wh.readEpochs().orderBy("subject_id", "epoch_idx", "delta_power")
      .drop("load_timestamp").collect()
    val filesBefore = wh.epochsFileCount()
    assert(filesBefore >= 20, s"expected >=20 small files, got $filesBefore")

    wh.compactEpochs(filesPerPartition = 1)
    val filesAfter = wh.epochsFileCount()
    assert(filesAfter <= 2, s"expected <=1 file per subject dir, got $filesAfter")
    // Physical re-layout only: the row multiset is untouched.
    val after = wh.readEpochs().orderBy("subject_id", "epoch_idx", "delta_power")
      .drop("load_timestamp").collect()
    assert(after.toSeq == before.toSeq)
    // Partition layout preserved: point reads still prune.
    assert(wh.readEpochs().filter($"subject_id" === 2).count() == 30)
  }
}

class JobRunnerSpec extends SparkSpec {

  test("full pipeline: extract, validate, load, transform, marts + errors") {
    val dir = tmpDir("job")
    val refs = SyntheticSource.writeRecordings(s"$dir/raw", 2)
    val badPath = s"$dir/raw/corrupt.edf"
    java.nio.file.Files.write(java.nio.file.Paths.get(badPath),
      "garbage".getBytes)
    val all = refs :+ RecordingRef(42, badPath, badPath)

    val report = JobRunner.run(spark,
      JobRunner.JobConfig(0, 3, s"$dir/warehouse"),
      all)

    assert(report.subjectsFailed == 1)
    assert(report.epochsLoaded > 2000) // 2 subjects × ~1150 valid epochs
    assert(report.martRows("sleep_summary") == 2)
    assert(report.martRows("sleep_metrics") == report.epochsLoaded)

    val wh = new Warehouse(spark, s"$dir/warehouse")
    val errs = wh.readErrors().collect()
    assert(errs.length == 1 && errs(0).getAs[Int]("subject_id") == 42)

    // Marts respect the dbt invariants (V5/V6).
    val summary = spark.read.parquet(s"$dir/warehouse/sleep_summary")
    Validation.requireAll(Validation.summaryChecks(summary))
  }

  test("lenient job config loads interrupted recordings instead of failing them") {
    val dir = tmpDir("job-lenient")
    val refs = SyntheticSource.writeRecordings(s"$dir/raw", 2)
    // Interrupt subject 1's recording: clip half of the final record.
    val psg1 = java.nio.file.Paths.get(refs(1).psgPath)
    java.nio.file.Files.write(psg1,
      java.nio.file.Files.readAllBytes(psg1).dropRight(150))

    // Strict default: the interrupted subject is a per-file error.
    val strict = JobRunner.run(spark,
      JobRunner.JobConfig(0, 2, s"$dir/warehouse_strict"), refs)
    assert(strict.subjectsFailed == 1)

    // Lenient: both subjects load, the salvaged subject does NOT count as
    // failed, and the salvage is queryable: exactly one SALVAGE_WARNING
    // row for the shortened subject lands in INGESTION_ERRORS.
    val lenient = JobRunner.run(spark,
      JobRunner.JobConfig(0, 2, s"$dir/warehouse_lenient", lenient = true),
      refs)
    assert(lenient.subjectsFailed == 0)
    assert(lenient.martRows("sleep_summary") == 2)
    assert(lenient.epochsLoaded > strict.epochsLoaded,
      "the salvaged subject's epochs must load")
    val whLenient = new Warehouse(spark, s"$dir/warehouse_lenient")
    val salvageRows = whLenient.readErrors().collect()
    assert(salvageRows.length == 1, salvageRows.mkString("; "))
    assert(salvageRows(0).getAs[Int]("subject_id") == refs(1).subjectId)
    assert(salvageRows(0).getAs[String]("error_type") ==
      Ingest.SalvageWarningType)
  }

  test("config validation rejects bad subject ranges") {
    intercept[IllegalArgumentException] {
      JobRunner.validateConfig(JobRunner.JobConfig(5, 3, "/tmp/x"))
    }
  }

  test("all-subjects-failed aborts before transform") {
    val dir = tmpDir("job-fail")
    val badPath = s"$dir/corrupt.edf"
    new java.io.File(dir).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(badPath), "x".getBytes)
    intercept[IllegalStateException] {
      JobRunner.run(spark, JobRunner.JobConfig(0, 1, s"$dir/warehouse"),
        Seq(RecordingRef(0, badPath, badPath)))
    }
  }
}

class BucketedWarehouseSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed epochs table serves subject-keyed aggregation without a shuffle") {
    val wh = new Warehouse(spark, tmpDir("wh-bucket"))
    val epochs = (1 to 4).toDF("subject_id").crossJoin(
      (0 until 50).toDF("epoch_idx"))
      .selectExpr("subject_id", "epoch_idx", "'N2' as stage",
        "15.0 as delta_power", "14.0 as theta_power", "8.0 as alpha_power",
        "1.0 as sigma_power", "2.0 as beta_power")
    wh.loadEpochsBucketed(epochs, buckets = 4)

    val agg = wh.readEpochsBucketed().groupBy("subject_id")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed read still shuffles:\n$plan")
    assert(agg.collect().map(_.getLong(1)).forall(_ == 50))
    spark.sql("drop table if exists sleep_epochs_bucketed")
  }
}
