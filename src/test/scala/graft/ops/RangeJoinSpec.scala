package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("point-in-interval matches a naive join, boundaries inclusive") {
    val intervals = Seq(
      (1L, 0L, 9L),     // within one bucket
      (2L, 5L, 25L),    // spans three buckets (width 10)
      (3L, 30L, 30L),   // degenerate single-point interval
      (4L, 95L, 105L)   // spans a bucket boundary
    ).toDF("iid", "s", "e")
    val points = (0L to 110L by 5).map(p => (p, s"p$p")).toDF("p", "tag")

    val got = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 10L)
      .select("iid", "p").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .filter($"p" >= $"s" && $"p" <= $"e")
      .select("iid", "p").as[(Long, Long)].collect().toSet
    assert(got == want, s"missing: ${want.diff(got)}, extra: ${got.diff(want)}")
    // Inclusive boundaries explicitly: 5 and 25 are in interval 2; 30 in 3.
    assert(got.contains((2L, 5L)) && got.contains((2L, 25L)))
    assert(got.contains((3L, 30L)))
  }

  test("as-of join carries the latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 5L), (1L, 10L), (1L, 15L), (1L, 2L), // key 1
      (2L, 7L)                                  // key 2: no match before 7? right below
    ).toDF("k", "t")
    val right = Seq(
      (1L, 5L, "a"), (1L, 12L, "b"),
      (2L, 9L, "c")
    ).toDF("k", "rt", "tag")

    val got = RangeJoin.asOf(left, right, "k", "t", "rt")
      .select($"k", $"t", $"asof.tag", $"asof.rt")
      .as[(Long, Long, Option[String], Option[Long])].collect().toSet
    assert(got == Set(
      (1L, 2L, None, None),          // before any right row
      (1L, 5L, Some("a"), Some(5L)), // inclusive same-instant match
      (1L, 10L, Some("a"), Some(5L)),
      (1L, 15L, Some("b"), Some(12L)),
      (2L, 7L, None, None)           // right row is later — no match
    ), s"got $got")
  }

  test("each matching pair is produced exactly once despite replication") {
    val intervals = Seq((1L, 0L, 99L)).toDF("iid", "s", "e") // 10 buckets
    val points = Seq((50L, "x")).toDF("p", "tag")
    val rows = RangeJoin.pointInInterval(points, intervals, "p", "s", "e", 10L)
    assert(rows.count() == 1, "interval replication must not duplicate matches")
  }
}
