package graft.sleep

import org.apache.spark.sql.{Dataset, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate (SURVEY §2.13's `Aggregator[IN,BUF,OUT]` seam):
  * per-subject sleep-bout statistics — bout counts and mean bout length per
  * stage, a standard sleep-fragmentation readout the reference's marts stop
  * short of.
  *
  * The buffer keeps (epoch_idx, stage) pairs and the reduction is
  * order-insensitive; runs are computed once per subject in `finish` after
  * sorting the buffer — bounded by epochs-per-subject (~1.2k), far below
  * task memory, and idiomatic for order-dependent aggregates over Spark's
  * unordered merge tree.
  */
object BoutStats {

  final case class EpochStage(epoch_idx: Int, stage: String)
  final case class StageBouts(stage: String, n_bouts: Int, mean_bout_epochs: Double)

  val aggregator: Aggregator[EpochStage, List[(Int, String)], Seq[StageBouts]] =
    new Aggregator[EpochStage, List[(Int, String)], Seq[StageBouts]] {
      override def zero: List[(Int, String)] = Nil
      override def reduce(b: List[(Int, String)], e: EpochStage): List[(Int, String)] =
        (e.epoch_idx, e.stage) :: b
      override def merge(a: List[(Int, String)], b: List[(Int, String)]): List[(Int, String)] =
        a ::: b
      override def finish(buf: List[(Int, String)]): Seq[StageBouts] = {
        val sorted = buf.sortBy(_._1)
        // Run-length encode consecutive equal stages.
        val runs = sorted.foldLeft(List.empty[(String, Int)]) {
          case ((st, len) :: rest, (_, s)) if st == s => (st, len + 1) :: rest
          case (acc, (_, s)) => (s, 1) :: acc
        }
        runs.groupBy(_._1).toSeq.map { case (stage, rs) =>
          StageBouts(stage, rs.size, rs.map(_._2).sum.toDouble / rs.size)
        }.sortBy(_.stage)
      }
      override def bufferEncoder: Encoder[List[(Int, String)]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
      override def outputEncoder: Encoder[Seq[StageBouts]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }

  /** Per-subject bout statistics table: (subject_id, stage, n_bouts,
    * mean_bout_epochs, mean_bout_minutes).
    */
  def perSubject(metrics: DataFrame): DataFrame = {
    val spark = metrics.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ds: Dataset[(Int, EpochStage)] = metrics
      .select(col("subject_id").cast("int"), col("epoch_idx").cast("int"),
        col("sleep_stage"))
      .as[(Int, Int, String)]
      .map { case (subj, idx, st) => (subj, EpochStage(idx, st)) }
    ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(aggregator.toColumn.name("bouts"))
      .toDF("subject_id", "bouts")
      .select(col("subject_id"), explode(col("bouts")).as("b"))
      .select(col("subject_id"), col("b.stage").as("stage"),
        col("b.n_bouts").as("n_bouts"),
        col("b.mean_bout_epochs").as("mean_bout_epochs"),
        (col("b.mean_bout_epochs") * SleepModels.EpochMinutes)
          .as("mean_bout_minutes"))
      .orderBy("subject_id", "stage")
  }
}
