package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over embedding columns
  * (`Array[Float]`) — north star ops (SURVEY §7.5).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k, the correctness baseline and
  *    the rerank stage. Query side broadcast, candidate side streamed —
  *    cost O(|queries|·|corpus|) but embarrassingly parallel.
  *  - [[lshTopK]]: random-hyperplane LSH (Charikar's SimHash for cosine,
  *    public literature): b hyperplanes → b-bit bucket signature; only
  *    same-bucket pairs are scored. Multi-probe (flipping one bit) trades
  *    recall for cost. At corpus scale the bucket join shuffles each vector
  *    once; no quadratic product.
  *
  * All vector math is `zip_with`/`aggregate` column expressions — fully
  * codegen'd, no UDFs, no driver-side loops. Hyperplanes are deterministic
  * literal arrays seeded on the driver (tiny: planes × dim doubles).
  */
object Similarity {

  /** Native codegen'd dot product ([[graft.expressions.DotProduct]]) —
    * bit-identical to the declarative
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` spelling but a fused loop.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.DotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))

  def dimOf(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head().getInt(0)

  /** Deterministic pseudo-random hyperplanes (xorshift-mixed), generated on
    * the driver as plain literals.
    */
  def randomPlanes(planes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(planes, dim)(rng.nextGaussian())
  }

  /** b-bit signature: bit i = sign(v · plane_i), packed into a long. */
  def hyperplaneSignature(v: Column, planes: Int, planeVals: Array[Array[Double]]): Column = {
    val bits: Seq[Column] = (0 until planes).map { i =>
      val plane = array(planeVals(i).map(lit): _*)
      when(dot(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Exact cosine top-k: `queries` small (broadcast), `corpus` streamed.
    * Norms are computed once per ROW before the pair join — per pair only
    * one fused dot product runs, the dominant cost at |queries|·|corpus|.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)))
          .as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Exact all-pairs cosine ≥ threshold as a blocked kernel: the full
    * (id, vector, norm) matrix is broadcast (vectors are small — n·dim
    * floats; for corpora beyond broadcast size, LSH-block first), and each
    * partition streams its rows against the broadcast block in a tight JIT
    * loop, emitting only qualifying pairs. A join-based spelling would
    * materialize all O(n²) joined rows just to compute one dot each —
    * here nothing but results ever exists. Accumulation order and the
    * dot/(n1·n2) formula match the expression form bit-for-bit.
    */
  def bruteForcePairs(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
    val block = rows.collect().sortBy(_._1)
    val ids = block.map(_._1)
    val vecs = block.map(_._2)
    val norms = vecs.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val bIds = spark.sparkContext.broadcast(ids)
    val bVecs = spark.sparkContext.broadcast(vecs)
    val bNorms = spark.sparkContext.broadcast(norms)

    rows.mapPartitions { it =>
      val ids = bIds.value; val vecs = bVecs.value; val norms = bNorms.value
      it.flatMap { case (id1, v1) =>
        val i1 = java.util.Arrays.binarySearch(ids, id1)
        var n1 = 0.0
        var d = 0
        while (d < v1.length) { n1 += v1(d).toDouble * v1(d).toDouble; d += 1 }
        n1 = math.sqrt(n1)
        val out = Vector.newBuilder[(Long, Long, Double)]
        var j = i1 + 1
        while (j < ids.length) {
          val v2 = vecs(j)
          var dot = 0.0
          var k = 0
          while (k < v1.length) { dot += v1(k).toDouble * v2(k).toDouble; k += 1 }
          val denom = n1 * norms(j)
          if (denom != 0.0) {
            val c = dot / denom
            // Raw cosine with a half-ulp-of-rounding margin: the caller
            // rounds with Spark's own round() (HALF_UP) and re-filters, so
            // results match the pure-expression spelling exactly.
            if (c >= minCosine - 5e-5) out += ((id1, ids(j), c))
          }
          j += 1
        }
        out.result()
      }
    }.toDF("id1", "id2", "cosine")
  }

  /** LSH-bucketed ANN top-k with single-bit multi-probe.
    *
    * Each corpus vector lands in exactly one bucket; each query probes its
    * own bucket plus the `probes` nearest single-bit-flip buckets. Join on
    * bucket id, exact cosine rerank within candidates, window top-k.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 12, probes: Int = 4,
      seed: Long = 7L): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    val planeVals = randomPlanes(planes, dim, seed)
    val sig = hyperplaneSignature(col(vecCol), planes, planeVals)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"), sig.as("bucket"))
    val probeBuckets: Column = {
      val base = sig
      val flips = (0 until math.min(probes, planes))
        .map(i => base.bitwiseXOR(lit(1L << i)))
      array_distinct(array(base +: flips: _*))
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"), explode(probeBuckets).as("bucket"))

    val scored = c.join(q, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0)))
          .as("cosine"))
      // A (query, neighbor) pair can surface via multiple probe buckets.
      .groupBy("query_id", "neighbor_id").agg(max("cosine").as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF-style coarse quantization: assign vectors to the nearest of
    * `nCells` centroid cells (centroids from a deterministic sample), then
    * search only the query's cell (+ neighbors). Provided as the alternate
    * scale path; centroid assignment is a broadcast of nCells × dim doubles.
    */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Array[Array[Double]]): DataFrame = {
    val cells = centroids.indices.map { i =>
      val c = array(centroids(i).map(lit): _*)
      struct(dot(col(vecCol), c)
        .minus(lit(centroids(i).map(x => x * x).sum / 2)).as("score"),
        lit(i).as("cell"))
    }
    df.withColumn("cell", greatest(cells: _*).getField("cell"))
  }
}
