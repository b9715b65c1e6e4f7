package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dev loop: run ONE registry query by name, dump its parquet + oracle SQL
  * for `tools/one.py` to hash-compare against DuckDB. Same session config
  * as [[Verify]] so results are bit-identical to the full gate.
  */
object One {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Sessions.localBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.byName(name)
    q.run(spark, sfDir).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/$name")
    q.oracle.foreach { sql =>
      Files.writeString(
        Paths.get(s"$outDir/$name.sql"),
        sql.replace(Stage.Placeholder, Stage.dir(sfDir)))
    }
    spark.stop()
  }
}
