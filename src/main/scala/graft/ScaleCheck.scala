package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Components, Dedup, Similarity}

/** Scaling harness: replicates the documents/embeddings tables R× (with id
  * offsets, so replicas are distinct rows that still form the same near-dup
  * structure per replica) and times the heavyweight operator families
  * end-to-end. A linear operator's wall-clock should grow ≈ R on a fixed
  * core count once fixed overhead amortizes; anything super-linear here is
  * a quadratic blow-up that 100 TB would amplify fatally.
  *
  * Run: `sbt "runMain graft.ScaleCheck [sfDir] [replications...]"`, e.g.
  * `sbt "runMain graft.ScaleCheck /root/testdata/sf0.1 1 4 10"`.
  */
object ScaleCheck {

  private def replicate(df: DataFrame, idCol: String, r: Int): DataFrame =
    df.crossJoin(
        df.sparkSession.range(r).select(col("id").as("__rep")))
      .withColumn(idCol, col(idCol) + col("__rep") * 10000000L)
      .drop("__rep")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    reps.foreach { r =>
      val docs = replicate(Tables.documents(spark, sfDir), "doc_id", r)
        .persist()
      val nDocs = docs.count() // materialize outside the timed region

      val (tCand, nCand) = time {
        Dedup.candidatePairs(docs).count()
      }
      val (tFull, nClusters) = time {
        val sh = Dedup.shingles(docs, "text", 5).persist()
        val pairs = Dedup.rerankJaccardOnShingles(
            Dedup.candidatePairsFromShingles(sh), sh)
          .filter(col("jaccard") >= 0.3).select("d1", "d2")
        val n = Components.connectedComponents(pairs)
          .select(countDistinct("label")).head.getLong(0)
        sh.unpersist(blocking = false)
        n
      }
      val (tSim, nSim) = time {
        Dedup.simhashNearDuplicates(docs).count()
      }
      docs.unpersist(blocking = false)

      val emb = replicate(Tables.embeddings(spark, sfDir), "vec_id", r)
        .persist()
      emb.count()
      val (tAnn, nAnn) = time {
        Similarity.lshCandidatePairs(emb, emb.filter(col("vec_id") < 20),
          "vec_id", "embedding").count()
      }
      emb.unpersist(blocking = false)

      println(f"""{"rep":$r,"docs":$nDocs,"lsh_cand_s":$tCand%.2f,"cands":$nCand,""" +
        f""""dedup_cluster_s":$tFull%.2f,"clusters":$nClusters,""" +
        f""""simhash_s":$tSim%.2f,"sim_pairs":$nSim,""" +
        f""""ann_cand_s":$tAnn%.2f,"ann_cands":$nAnn}""")
    }
    spark.stop()
  }
}
