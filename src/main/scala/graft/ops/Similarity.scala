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

  /** Exact all-pairs cosine ≥ threshold via a triangular block-grid
    * self-join (the classic distributed theta-join layout): ids hash into
    * `blocks` buckets; grid cell (i, j) with i ≤ j receives bucket-i rows as
    * its left side and bucket-j rows as its right side, so every unordered
    * pair of rows meets in EXACTLY one cell (diagonal cells additionally
    * keep `id_a < id_b`). Nothing is collected to the driver and no full
    * matrix is broadcast — each row is shuffled to ~(blocks+1)/2 cells, the
    * per-cell pairing is a streamed codegen'd dot-product loop, and cell
    * count B(B+1)/2 bounds parallelism, so `blocks` tunes replication vs
    * task width (exact all-pairs work is inherently O(n²); this layout just
    * spreads it evenly with O(n·B) shuffle volume).
    *
    * Emits raw cosine with a half-ulp-of-rounding margin below `minCosine`:
    * the caller rounds with Spark's own `round()` (HALF_UP) and re-filters,
    * so results match the DuckDB `list_cosine_similarity` spelling exactly.
    */
  def blockedExactPairs(emb: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, blocks: Int = 16): DataFrame = {
    val base = emb.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
      l2Norm(col(vecCol)).as("nrm"),
      pmod(xxhash64(col(idCol)), lit(blocks.toLong)).cast("int").as("blk"))
    val left = base.select(col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("blk").as("bi"),
      explode(sequence(col("blk"), lit(blocks - 1))).as("bj"))
    val right = base.select(col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"),
      explode(sequence(lit(0), col("blk"))).as("bi"), col("blk").as("bj"))
    left.join(right, Seq("bi", "bj"))
      .filter(col("bi") =!= col("bj") || col("id_a") < col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("id1"),
        greatest(col("id_a"), col("id_b")).as("id2"),
        (dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
          .as("cosine"))
      .filter(col("cosine") >= minCosine - 5e-5)
  }

  /** LSH-bucketed ANN top-k with single-bit multi-probe.
    *
    * Each corpus vector lands in exactly one bucket; each query probes its
    * own bucket plus the `probes` nearest single-bit-flip buckets. Join on
    * bucket id, exact cosine rerank within candidates, window top-k.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 12, probes: Int = 4,
      seed: Long = 7L): DataFrame =
    rerankTopK(
      lshCandidatePairs(corpus, queries, idCol, vecCol, planes, probes, seed),
      corpus, idCol, vecCol, k)

  /** Candidate (query_id, neighbor_id) pairs from the bucket join alone —
    * distinct, self-pairs removed. This is the non-SQL-expressible stage of
    * [[lshTopK]]; splitting it out lets callers stage the candidate set and
    * hash-verify the downstream rerank independently (OpsQueries.e5).
    */
  def lshCandidatePairs(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, planes: Int = 12, probes: Int = 4,
      seed: Long = 7L): DataFrame = {
    val dim = dimOf(corpus, vecCol)
    val planeVals = randomPlanes(planes, dim, seed)
    val sig = hyperplaneSignature(col(vecCol), planes, planeVals)

    val c = corpus.select(col(idCol).as("neighbor_id"), sig.as("bucket"))
    val probeBuckets: Column = {
      val base = sig
      val flips = (0 until math.min(probes, planes))
        .map(i => base.bitwiseXOR(lit(1L << i)))
      array_distinct(array(base +: flips: _*))
    }
    val q = queries.select(col(idCol).as("query_id"),
      explode(probeBuckets).as("bucket"))

    // A (query, neighbor) pair can surface via multiple probe buckets.
    c.join(q, "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
  }

  /** Exact cosine rerank of candidate pairs + deterministic top-k: join the
    * id pairs back to their vectors (query ids must exist in `corpus`),
    * score, rank on (cosine desc, id). The join is on single id keys — at
    * corpus scale both sides shuffle once.
    *
    * @param roundTo rank on the cosine ROUNDED (and zero-normalized) to this
    *        many digits — oracle-parity mode: a hash-verifying mirror query
    *        recomputing the cosine in another engine can differ in the last
    *        ulp, which would flip near-tie rankings; rounding before the
    *        deterministic (cosine, id) tie-break makes both engines rank
    *        identically.
    */
  def rerankTopK(pairs: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, roundTo: Option[Int] = None): DataFrame = {
    val qv = corpus.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      l2Norm(col(vecCol)).as("qn"))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      l2Norm(col(vecCol)).as("cn"))
    val raw = dot(col("qv"), col("cv")) / nullif(col("qn") * col("cn"), lit(0.0))
    val scored = pairs.join(qv, "query_id").join(cv, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        roundTo.fold(raw)(n => graft.Norm.rz(raw, n)).as("cosine"))
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

  /** Deterministic coarse centroids: the `nCells` lowest-id vectors. Crude
    * seeds — refine with [[kmeansStep]] (each step is one distributed
    * assign + per-cell mean). Centroids are nCells × dim doubles: tiny,
    * driver-resident by design, broadcast into every assignment expression.
    */
  def sampleCentroids(df: DataFrame, idCol: String, vecCol: String,
      nCells: Int): Array[Array[Double]] =
    df.orderBy(col(idCol)).limit(nCells)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)

  /** One Lloyd iteration, fully distributed: assign every vector to its
    * cell, then per-(cell, dimension) mean via posexplode — a single
    * hash-aggregate shuffle keyed on (cell, pos). Cells that lost all
    * members keep their previous centroid.
    */
  def kmeansStep(df: DataFrame, vecCol: String,
      centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val means = ivfAssign(df, vecCol, centroids)
      .select(col("cell"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("cell", "pos").agg(avg(col("x").cast("double")).as("m"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (cell, rows) =>
        val dim = rows.map(_.getInt(1)).max + 1
        val v = new Array[Double](dim)
        rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
        cell -> v
      }
    centroids.indices.map(i => means.getOrElse(i, centroids(i))).toArray
  }

  /** IVF-probed candidate (query_id, neighbor_id) pairs: corpus vectors are
    * assigned to their single nearest cell; each query probes its `nProbe`
    * highest-scoring cells (sorted centroid scores, no driver round-trip)
    * and meets only those cells' vectors — the inverted-file analog of
    * [[lshCandidatePairs]], one cell-keyed shuffle, no quadratic product.
    */
  def ivfCandidatePairs(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val scored = centroids.indices.map { i =>
      val c = array(centroids(i).map(lit): _*)
      struct(dot(col(vecCol), c)
        .minus(lit(centroids(i).map(x => x * x).sum / 2)).as("score"),
        lit(i).as("cell"))
    }
    val probes = slice(
      sort_array(array(scored: _*), asc = false), 1, nProbe)
    val q = queries
      .select(col(idCol).as("query_id"), explode(probes).as("probe"))
      .select(col("query_id"), col("probe").getField("cell").as("cell"))
    val c = ivfAssign(corpus, vecCol, centroids)
      .select(col(idCol).as("neighbor_id"), col("cell"))
    c.join(q, "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id").distinct()
  }

  /** IVF-probed ANN top-k: candidate generation via [[ivfCandidatePairs]],
    * exact cosine rerank + deterministic ranking via [[rerankTopK]].
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroids: Array[Array[Double]],
      nProbe: Int = 2, roundTo: Option[Int] = None): DataFrame =
    rerankTopK(ivfCandidatePairs(corpus, queries, idCol, vecCol, centroids, nProbe),
      corpus, idCol, vecCol, k, roundTo)

  // ---------------------------------------------------------------- PQ --

  /** Product-quantization codebooks: `cb(m)(c)` is centroid `c` of subspace
    * `m` (public literature: Jégou, Douze, Schmid, "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011). The vector is split into
    * `subspaces` contiguous slices; each slice gets its own small k-means
    * codebook, so a D-dim float vector (4·D bytes) compresses to `subspaces`
    * byte-sized codes — the standard memory-bound scale path for
    * billion-vector ANN (256 B → 8 B at D=64, M=8).
    *
    * Training is Lloyd's algorithm run over ALL subspaces in ONE distributed
    * aggregation per iteration: every row explodes to (sub, nearest-code,
    * subvector), then a single (sub, code, pos)-keyed mean shuffle updates
    * every codebook at once — iterations cost one job each, not one per
    * subspace. The collected means are `subspaces × codes × subDim` doubles
    * (1 024 at the default 8×16×8): driver-resident by design, same budget
    * as [[sampleCentroids]]/[[kmeansStep]]. Seeds are the sub-slices of the
    * `codes` lowest-id vectors — deterministic, no RNG.
    */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
      subspaces: Int = 8, codes: Int = 16,
      iters: Int = 2): Array[Array[Array[Double]]] = {
    val dim = dimOf(df, vecCol)
    require(dim % subspaces == 0,
      s"dim $dim not divisible into $subspaces subspaces")
    val subDim = dim / subspaces
    val seeds = df.orderBy(col(idCol)).limit(codes)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.length == codes, s"need ≥ $codes vectors to seed PQ")
    var cb = Array.tabulate(subspaces, codes)((m, c) =>
      seeds(c).slice(m * subDim, (m + 1) * subDim))
    for (_ <- 0 until iters) {
      // Codes for ALL subspaces in one fused native kernel
      // ([[graft.expressions.PqCodes]] — the declarative greatest/struct
      // spelling builds subspaces × codes literal subtrees and costs
      // seconds of driver-side analysis per iteration), then explode to
      // (sub, code, subvector) and mean per (sub, code, dimension) — one
      // job per iteration. Empty cells keep their previous centroid.
      val entries = cb.indices.map { m =>
        struct(lit(m).as("sub"),
          element_at(col("__pq_codes"), m + 1).as("code"),
          slice(col(vecCol), m * subDim + 1, subDim)
            .cast("array<double>").as("sv"))
      }
      val means = df
        .withColumn("__pq_codes",
          graft.expressions.PqCodes(col(vecCol), cb))
        .select(explode(array(entries: _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.code").as("code"),
          posexplode(col("e.sv")).as(Seq("pos", "x")))
        .groupBy("sub", "code", "pos").agg(avg("x").as("mu"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
      cb = Array.tabulate(subspaces, codes) { (m, c) =>
        means.get((m, c)).fold(cb(m)(c)) { rows =>
          val v = cb(m)(c).clone()
          rows.foreach(r => v(r.getInt(2)) = r.getDouble(3))
          v
        }
      }
    }
    cb
  }

  /** Nearest-centroid code within ONE subspace codebook: L2 argmin via the
    * `dot(v, c) − ‖c‖²/2` trick (vector's own norm is constant across
    * candidates), ties → higher code — one fused dot per centroid, all
    * codegen'd.
    */
  def pqSubCode(subVec: Column, centroids: Array[Array[Double]]): Column =
    greatest(centroids.indices.map { c =>
      val cen = array(centroids(c).map(lit): _*)
      struct(
        dot(subVec, cen).minus(lit(centroids(c).map(x => x * x).sum / 2))
          .as("score"),
        lit(c).as("code"))
    }: _*).getField("code")

  /** PQ-encode every vector: `codes` is an `array<int>` of length
    * `subspaces` — the 8-byte row a 100 TB index actually stores. One
    * linear pass, no shuffle; the per-row argmin loop is the fused native
    * [[graft.expressions.PqCodes]] kernel (bit-identical to the
    * [[pqSubCode]] declarative spelling — PqSpec proves it).
    */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      cb: Array[Array[Array[Double]]]): DataFrame =
    df.select(col(idCol),
      graft.expressions.PqCodes(col(vecCol), cb).as("codes"))

  /** Asymmetric-distance (ADC) top-k over PQ codes: each QUERY keeps its
    * full float vector and precomputes a lookup table
    * `lut(m)(c) = dot(q_sub_m, centroid_m_c)` (subspaces × codes doubles,
    * built as column expressions — no driver round-trip); each CORPUS row
    * is scored by `subspaces` table lookups on its byte codes, never
    * touching float vectors. That asymmetry is the point at scale: the
    * streamed side of the scan reads 8 B/vector instead of 256 B, and the
    * per-row score is M integer-indexed lookups + adds. Same
    * broadcast-queries topology as [[bruteForceTopK]].
    *
    * The score approximates `dot(query, reconstruction(codes))`; summation
    * runs in subspace order (deterministic), and ranking happens on the
    * score ROUNDED to `roundTo` digits so a hash-verifying oracle that
    * re-sums the per-subspace contributions in another engine cannot flip
    * a ranking on a last-ulp reorder.
    */
  def pqAdcTopK(coded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cb: Array[Array[Array[Double]]], k: Int,
      roundTo: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      graft.expressions.PqLut(col(vecCol), cb).as("lut"))
    val c = coded.select(col(idCol).as("neighbor_id"), col("codes"))
    val score = graft.expressions.PqAdcScore(col("codes"), col("lut"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.Norm.rz(score, roundTo).as("adc_score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_score").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Full PQ search: ADC shortlist, then exact rerank — the production
    * IVF-PQ/ADC topology (ADC is a SHORTLIST stage: coarse codes tie
    * near-identical rows, so its raw top-k recall is poor by construction;
    * every deployed PQ system reranks a shortlist with exact scores). Full
    * float vectors are touched only for `shortlist · |queries|` rows — the
    * corpus-wide scan stays on the 8-byte codes.
    */
  def pqSearchTopK(coded: DataFrame, queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, cb: Array[Array[Array[Double]]],
      k: Int, shortlist: Int = 50, roundTo: Option[Int] = Some(4)): DataFrame = {
    val cands = pqAdcTopK(coded, queries, idCol, vecCol, cb, shortlist)
      .select("query_id", "neighbor_id")
    rerankTopK(cands, corpus, idCol, vecCol, k, roundTo)
  }

  /** Symmetric per-vector int8 scalar quantization — the memory-bound
    * scale path for embedding search: a float vector is 4 B/component, its
    * int8 form 1 B + one double scale per vector, so the scan side of a
    * similarity pass moves ~4× less data and an in-memory index holds ~4×
    * more vectors. `scale = max|x| / 127`, `q_i = round(x_i / scale)` ∈
    * [-127, 127]; an all-zero vector quantizes to zeros with scale 0 (its
    * cosine is NULL-guarded downstream). Pure column expressions — one
    * linear pass, no shuffle.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol),
        (aggregate(col(vecCol), lit(0.0),
          (acc, x) => greatest(acc, abs(x.cast("double")))) / lit(127.0))
          .as("scale"))
      .select(col(idCol), col("scale"),
        transform(col(vecCol),
          x => round(x.cast("double") / col("scale")).cast("int")).as("qvec"))

  /** Cosine of two int8-quantized vectors: the dot and norms accumulate in
    * LONG (exact, order-independent — the property that makes quantized
    * scoring hash-verifiable across engines); only the per-vector scale
    * multiplications are floating-point. The integer dots run through the
    * native codegen'd [[graft.expressions.QuantizedDot]] — bit-identical
    * to the `zip_with`/`aggregate` spelling, minus its per-element
    * higher-order-function overhead on the O(|queries|·|corpus|) scan.
    */
  def dequantizedCosine(qScale: Column, qVec: Column, cScale: Column,
      cVec: Column): Column = {
    val idot = graft.expressions.QuantizedDot(qVec, cVec)
    val inorm = (v: Column) => graft.expressions.QuantizedDot(v, v)
    (idot.cast("double") * qScale * cScale) /
      nullif(
        sqrt(inorm(qVec).cast("double")) * qScale *
          (sqrt(inorm(cVec).cast("double")) * cScale),
        lit(0.0))
  }

  /** Top-k neighbors scored on quantized vectors (see [[quantizeInt8]]):
    * same broadcast-queries topology as [[bruteForceTopK]], but the
    * streamed corpus side reads int8 data. `scoreTransform` lets callers
    * rank on a rounded score (oracle parity needs ranking on the value
    * both engines agree on bit-for-bit).
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      k: Int, scoreTransform: Column => Column = identity): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col("scale").as("qs"),
      col("qvec").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col("scale").as("cs"),
      col("qvec").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        scoreTransform(
          dequantizedCosine(col("qs"), col("qv"), col("cs"), col("cv")))
          .as("qcosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qcosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** IVF residuals: assign every vector to its coarse cell and subtract
    * that cell's centroid — the IVF-PQ composition step (Jégou et al. 2011
    * §IV): PQ codebooks trained on RESIDUALS spend their precision on the
    * within-cell detail the coarse quantizer can't express, a strictly
    * better rate-distortion trade than flat PQ at equal bytes. One linear
    * pass: the centroid table (nCells × dim doubles) broadcast-joins on the
    * assigned cell and the subtraction is `dim` unrolled element_at terms —
    * no higher-order functions, stays inside whole-stage codegen. Residual
    * components are cast to float so the [[pqTrain]]/[[pqEncode]] native
    * kernels consume them unchanged.
    */
  def residualsWithCells(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    val dim = centroids(0).length
    val spark = df.sparkSession
    val cenDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        centroids.toIndexedSeq.zipWithIndex.map { case (c, i) =>
          org.apache.spark.sql.Row(i, c.toSeq)
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cen",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    ivfAssign(df, vecCol, centroids)
      .join(broadcast(cenDf), "cell")
      .select(col(idCol), col("cell"),
        array((0 until dim).map { i =>
          (element_at(col(vecCol), i + 1).cast("double") -
            element_at(col("cen"), i + 1)).cast("float")
        }: _*).as("resid"))
  }

  /** IVF-PQ shortlist (query_id, neighbor_id): probe the `nProbe` coarse
    * cells per query (rounded L2-trick scores, cell tie-break), then score
    * only the probed cells' posting rows by the exact inner-product
    * decomposition q·x̂ = q·c(cell) + q·r̂ — one [[graft.expressions.PqLut]]
    * per query against the RESIDUAL codebooks plus a scalar q·centroid
    * offset per probed cell, summed with
    * [[graft.expressions.PqAdcScore]]'s table lookups. The candidate join
    * is CELL-KEYED (the inverted-file prune), never a corpus-wide scan;
    * `coded` must carry (idCol, cell, codes) as produced by
    * [[residualsWithCells]] + [[graft.expressions.PqCodes]]. ADC totals
    * round at `roundTo` before the cut window so a hash-verifying oracle
    * can't flip a shortlist membership on a last-ulp reorder.
    */
  def ivfPqShortlist(coded: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, cents: Array[Array[Double]],
      cbr: Array[Array[Array[Double]]], nProbe: Int, shortlist: Int,
      roundTo: Int = 4): DataFrame = {
    val spark = coded.sparkSession
    val cenDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        cents.toIndexedSeq.zipWithIndex.map { case (c, i) =>
          org.apache.spark.sql.Row(i, c.toSeq)
        }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cell",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("cen",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)))))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qe"))
    val qcDot = graft.expressions.DotProduct(col("qe"), col("cen"))
    val cellScore = q.crossJoin(broadcast(cenDf))
      .select(col("query_id"), col("cell"), col("qe"),
        qcDot.as("cdot_raw"),
        graft.Norm.rz(qcDot -
          aggregate(col("cen"), lit(0.0), (a, x) => a + x * x) / 2, roundTo)
          .as("pscore"))
    val probed = cellScore
      .withColumn("prn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("pscore").desc, col("cell"))))
      .filter(col("prn") <= nProbe)
      .select(col("query_id"), col("cell"), col("cdot_raw"),
        graft.expressions.PqLut(col("qe"), cbr).as("lut"))
    coded.join(broadcast(probed), "cell")
      .filter(col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        graft.Norm.rz(col("cdot_raw") +
          graft.expressions.PqAdcScore(col("codes"), col("lut")), roundTo)
          .as("adc_score"))
      .withColumn("srn", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("adc_score").desc, col("neighbor_id"))))
      .filter(col("srn") <= shortlist)
      .select("query_id", "neighbor_id")
  }

  /** Binary (1-bit sign) quantization: each 64-dim vector packs into TWO
    * longs of sign bits (bit i of word w is 1 iff `vec[32w + i] > 0`) — a
    * 16× scan reduction vs f32, the most compressed index family next to
    * int8 ([[quantizeInt8]]) and PQ ([[pqEncode]]). Spelled as 32 unrolled
    * `when` terms per word: Spark's higher-order array functions are
    * CodegenFallback, so the unrolled-literal form is what keeps the
    * packing projection inside whole-stage codegen.
    */
  def signPack(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    def word(off: Int): Column =
      (0 until 32).map { i =>
        when(element_at(col(vecCol), off + i + 1) > lit(0f), lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    df.select(col(idCol), word(0).as("w0"), word(32).as("w1"))
  }

  /** Hamming top-k over [[signPack]]ed words: the e1/e7 broadcast-queries ×
    * streamed-corpus topology, with `bit_count(xor)` — three codegen'd
    * integer builtins per word pair — as the distance kernel. Integer-exact
    * distances need no rounding discipline; ties break on the candidate id.
    */
  def binaryTopK(packed: DataFrame, queries: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col("w0").as("qw0"),
      col("w1").as("qw1"))
    val scored = packed.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol).as("cid"),
        (bit_count(col("qw0").bitwiseXOR(col("w0"))) +
          bit_count(col("qw1").bitwiseXOR(col("w1"))))
          .cast("int").as("hamming"))
    val w = Window.partitionBy("qid").orderBy(col("hamming"), col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
