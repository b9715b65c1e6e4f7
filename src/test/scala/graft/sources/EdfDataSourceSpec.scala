package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.edf.Edf

class EdfDataSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = tmpDir("edfsource")
    val sfreq = 100.0
    (0 until 2).foreach { i =>
      val x = Array.tabulate(1000)(j =>
        50e-6 * math.sin(2 * math.Pi * (i + 2) * j / sfreq))
      val bytes = Edf.write(
        Seq("EEG Fpz-Cz" -> x, "EOG horizontal" -> x.map(_ * 2)), sfreq)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$d/rec$i.edf"), bytes)
    }
    d
  }

  test("spark.read.format(edf) reads channel chunks with values") {
    val df = spark.read.format("edf").option("chunk_records", "4").load(dir)
    assert(df.schema == EdfDataSource.Schema)
    // 2 files × 2 channels × ceil(10 records / 4) chunks.
    assert(df.count() == 2 * 2 * 3)
    val row = df.filter(col("channel") === "EEG Fpz-Cz" && col("chunk_idx") === 0)
      .filter(col("path").contains("rec0")).head()
    assert(row.getAs[Double]("sfreq") == 100.0)
    assert(row.getAs[Double]("t0_sec") == 0.0)
    val samples = row.getSeq[Double](row.fieldIndex("samples"))
    assert(samples.length == 400)
    assert(math.abs(samples(25) - 50e-6 * math.sin(2 * math.Pi * 2 * 25 / 100.0)) < 2e-7)
  }

  test("column pruning skips waveform decode for metadata queries") {
    val meta = spark.read.format("edf").load(dir)
      .select("path", "channel", "sfreq")
    val plan = meta.queryExecution.executedPlan.toString()
    assert(!plan.contains("samples"), s"samples not pruned:\n$plan")
    assert(meta.distinct().count() == 4)
  }

  test("chunk time offsets advance by chunk length") {
    val df = spark.read.format("edf").option("chunk_records", "4").load(dir)
    val t0s = df.filter(col("channel") === "EOG horizontal")
      .filter(col("path").contains("rec1"))
      .select("chunk_idx", "t0_sec").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(t0s == Map(0 -> 0.0, 1 -> 4.0, 2 -> 8.0))
  }
}
