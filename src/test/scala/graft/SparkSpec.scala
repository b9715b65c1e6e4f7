package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM via Test/fork). */
object TestSpark {
  // Engine-default confs (graft.Sessions) apply here too, so specs assert
  // behavior under the same session shape the bench/verify entrypoints run.
  lazy val session: SparkSession = Sessions.localBuilder("4")
    .appName("graft-test")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
