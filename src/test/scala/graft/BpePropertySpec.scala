package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Independent-reference property check for `t37_bpe_apply`. The DuckDB
  * oracle replays the SAME delimited-string replace-fold the query uses, so
  * a bug in that shared algorithm would pass the parity gate; this spec
  * recomputes the whole query — merge learning, rank-ordered greedy
  * application, per-doc stats, vocabulary ids — with a direct symbol-list
  * implementation in plain Scala and compares row for row on randomized
  * corpora (small alphabet → heavy pair-count ties, exercising every
  * tie-break).
  */
class BpePropertySpec extends SparkSpec {

  import spark.implicits._

  /** Reference BPE: learn top-20 adjacent char-pair counts (within words of
    * length ≥ 2, count desc / pair asc), then apply each merge in rank
    * order as one left-to-right non-overlapping pass over the symbol list.
    * All rules are single-char pairs, so merged 2-char symbols are inert.
    */
  private def reference(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, String, Long, Long)] = {
    val pairCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((_, text) <- docs; w <- text.split(" ", -1) if w.length >= 2;
         i <- 0 until w.length - 1)
      pairCounts(w.substring(i, i + 2)) =
        pairCounts.getOrElse(w.substring(i, i + 2), 0L) + 1L
    val merges = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
      .map(_._1)

    def applyWord(w: String): Seq[String] = {
      var syms = w.map(_.toString)
      for (rule <- merges) {
        val (a, b) = (rule.substring(0, 1), rule.substring(1, 2))
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
            out += rule; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toIndexedSeq
      }
      syms
    }

    val docTokens: Seq[(Long, Seq[String])] =
      docs.map { case (id, text) =>
        id -> text.split(" ", -1).toSeq.filter(_.nonEmpty).flatMap(applyWord)
      }
    val vocabIds: Map[String, Long] = docTokens.flatMap(_._2)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }.map(_._1).zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap
    docTokens.map { case (id, toks) =>
      val cnts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val (topTok, topN) = cnts.toSeq.minBy { case (t, n) => (-n, t) }
      (id, toks.size.toLong, cnts.size.toLong, topTok, topN, vocabIds(topTok))
    }
  }

  test("t37 matches an independent symbol-list BPE implementation") {
    for (seed <- Seq(7, 41, 1337)) {
      val rnd = new Random(seed)
      val alphabet = "abcde"
      def word() = (1 to (1 + rnd.nextInt(7)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val docs = (0L until (20 + rnd.nextInt(20)).toLong).map { id =>
        id -> (1 to (3 + rnd.nextInt(6))).map(_ => word()).mkString(" ")
      }
      val dir = tmpDir(s"graft_bpe_prop$seed")
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")

      val got = Registry.byName("t37_bpe_apply").run(spark, dir)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[String]("top_token"), r.getAs[Long]("top_n"),
          r.getAs[Long]("top_token_id"))).toSeq.sortBy(_._1)
      val want = reference(docs).sortBy(_._1)
      assert(got == want, s"seed=$seed:\n got=${got.take(5)}…\nwant=${want.take(5)}…")
    }
  }
}
