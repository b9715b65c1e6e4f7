package graft

import org.apache.spark.sql.SparkSession

/** The SQL face of the native expressions: `GraftExtensions` must register
  * every function into a session's catalog so `spark.sql("... dot_product
  * (...)")` works — extensions apply per-session at build time, so this
  * spec builds a sibling session (same SparkContext) with the extensions
  * installed and restores the shared session afterwards.
  */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions registers every native function for SQL use") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val withExt = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.expressions.GraftExtensions)
      .getOrCreate()
    try {
      val r = withExt.sql(
        """select
          |  dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) as d,
          |  quantized_dot(array(2, 3), array(4, 5)) as q,
          |  sorted_intersect_count(
          |    array(1L, 2L, 5L), array(2L, 5L, 9L)) as c,
          |  size(shingle_hashes(array('a', 'b', 'c'), 2)) as nh,
          |  shingle_strings(array('a', 'b', 'c'), 2) as ss,
          |  chunk_join(array('a', 'b', 'c'), 2) as cj
          |""".stripMargin).head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getLong(1) == 23L)
      assert(r.getLong(2) == 2L)
      assert(r.getInt(3) == 2)
      assert(r.getSeq[String](4) == Seq("a b", "b c"))
      assert(r.getSeq[String](5) == Seq("a b", "c"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
