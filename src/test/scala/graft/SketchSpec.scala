package graft

import org.apache.spark.sql.functions._

/** t40's Count-Min sketch contract on a constructed skewed corpus with
  * known true counts: the CM estimate must NEVER undercount (the one-sided
  * guarantee the sketch exists for), the top-10 ranking and exact counts
  * must match the plan, and a dense vocabulary (far more types than the
  * 4×64 cells) must still rank the planted heavy hitters first.
  */
class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("CM estimates never undercount and heavy hitters surface") {
    // 300 distinct filler types (>> 64 buckets → guaranteed collisions)
    // plus two planted heavy hitters with known counts.
    val words =
      Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
        (0 until 300).map(i => s"w$i")
    val docs = words.grouped(30).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" "), "en", "src0") }
      .toSeq
    val dir = tmpDir("cm")
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Registry.byName("t40_countmin_heavy_hitters").run(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(out.length === 10)
    assert(out.head._1 === "alpha" && out.head._2 === 100L)
    assert(out(1)._1 === "beta" && out(1)._2 === 50L)
    out.foreach { case (tok, exact, est, over, _) =>
      assert(est >= exact, s"$tok undercounted: $est < $exact")
      assert(over === est - exact)
    }
    // fillers all have count 1, rank 3..10 is the lexicographic head
    assert(out.drop(2).map(_._1).toSeq ===
      (0 until 300).map(i => s"w$i").sorted.take(8))
  }

  /** Independent Scala HLL over the same md5-prefix hash: every stage of
    * t41 (bucket, rho, registers, scaled integer sum, estimate) recomputed
    * with java.security MessageDigest + Long bit ops — no Spark, no SQL.
    */
  private def referenceHll(tokens: Set[String]): (Double, Long) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val regs = new Array[Int](64)
    tokens.foreach { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val bucket = (h & 63L).toInt
      val w = h >>> 6
      val rho =
        if (w == 0) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > regs(bucket)) regs(bucket) = rho
    }
    val sScaled = regs.map(m => 1L << (55 - m)).sum
    val zeros = regs.count(_ == 0).toLong
    (0.709 * 4096.0 * math.pow(2.0, 55) / sScaled.toDouble, zeros)
  }

  test("HLL estimate matches an independent reference and its error bound") {
    // 500 distinct types in one source, 40 in another — enough spread to
    // exercise both dense and sparse register states.
    val big = (0 until 500).map(i => s"tok$i")
    val small = (0 until 40).map(i => s"rare$i")
    val docs =
      big.grouped(25).map(_.mkString(" ")).zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "srcA") } ++
        small.grouped(8).map(_.mkString(" ")).zipWithIndex
          .map { case (t, i) => (1000L + i, t, "en", "srcB") }
    val dir = tmpDir("hll")
    docs.toSeq.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Registry.byName("t41_hll_distinct").run(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(out.keySet === Set("srcA", "srcB"))
    val (exactA, zerosA, estA, errA) = out("srcA")
    assert(exactA === 500L)
    for ((src, toks) <- Seq("srcA" -> big.toSet, "srcB" -> small.toSet)) {
      val (refEst, refZeros) = referenceHll(toks)
      val (exact, zeros, est, err) = out(src)
      assert(zeros === refZeros, s"$src zero registers")
      assert(est === math.rint(refEst * 10000) / 10000, s"$src estimate")
      assert(err === math.rint((refEst - exact) / exact * 10000) / 10000,
        s"$src rel_err")
    }
    // m=64 → standard error 1.04/√64 = 13%; 3σ bound on the dense source.
    assert(math.abs(estA - 500.0) / 500.0 < 0.39,
      s"srcA estimate $estA outside 3σ of 500")
    assert(zerosA < 32, "500 types should occupy most of 64 registers")
    assert(math.abs(math.abs(errA) - math.abs(estA - 500.0) / 500.0) < 2e-4)

    // Mergeability (the t42 contract): the pairwise bucket-max union of the
    // two sources' registers must give EXACTLY the estimate of sketching
    // A ∪ B directly — lossless distributed combine.
    val union = Registry.byName("t42_hll_union").run(spark, dir).collect()
    assert(union.length === 1)
    val row = union.head
    assert(row.getString(0) === "srcA" && row.getString(1) === "srcB")
    assert(row.getLong(2) === 540L)  // disjoint vocabularies
    assert(row.getLong(3) === 0L)
    val (refU, _) = referenceHll(big.toSet ++ small.toSet)
    assert(row.getDouble(4) === math.rint(refU * 10000) / 10000, "hll_union")
    val (refA, _) = referenceHll(big.toSet)
    val (refB, _) = referenceHll(small.toSet)
    assert(row.getDouble(5) ===
      math.rint((refA + refB - refU) * 10000) / 10000, "hll_inter")
  }

  test("MinHash estimate is exact on identical docs, bounded on overlaps") {
    // doc 0/1: identical (J=1, estimate MUST be 1.0 — same shingle set →
    // same signature). doc 2: half-overlapping with 0 (J≈1/3 for these
    // shingles). doc 3: disjoint (below the 0.2 gate, must not appear).
    val a = (0 until 40).map(i => s"w$i").mkString(" ")
    val half = ((0 until 20).map(i => s"w$i") ++
      (0 until 20).map(i => s"x$i")).mkString(" ")
    val other = (0 until 40).map(i => s"z$i").mkString(" ")
    val dir = tmpDir("mh")
    Seq((0L, a, "en", "s0"), (1L, a, "en", "s0"),
      (2L, half, "en", "s0"), (3L, other, "en", "s0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val out = Registry.byName("d8_minhash_accuracy").run(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out.contains((0L, 1L)) && out.contains((0L, 2L)) &&
      out.contains((1L, 2L)))
    assert(!out.keySet.exists { case (x, y) => x == 3L || y == 3L })
    val (ex01, est01, err01) = out((0L, 1L))
    assert(ex01 === 1.0 && est01 === 1.0 && err01 === 0.0)
    // 32-fn estimate on a true J=1/3-ish pair: binomial σ = √(J(1−J)/32)
    // ≈ 0.083 — allow 4σ.
    val (ex02, est02, err02) = out((0L, 2L))
    assert(math.abs(est02 - ex02) < 0.34, s"est $est02 vs exact $ex02")
    assert(math.abs(err02 - math.abs(est02 - ex02)) < 2e-6)
  }

  test("Bloom FPR matches theory, zero false negatives") {
    // 600 distinct single-token docs → n=600 keys in an m=4096, k=3 filter.
    val docs = (0 until 600).map(i => (i.toLong, s"content-$i", "en", "s0"))
    val dir = tmpDir("bloom")
    docs.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val r = Registry.byName("d9_bloom_fpr").run(spark, dir).collect().head
    val (nKeys, bitsSet, allHit, nFp, fpr) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(nKeys === 600L)
    assert(allHit === 600L, "a Bloom filter must never false-negative")
    assert(fpr === nFp / 1000.0)
    // Theory: p_bit = 1 − (1 − 1/m)^(k·n); FPR ≈ p_bit³. Binomial 4σ band
    // over 1000 probes, plus the usual ±10% model slack for small m.
    val pBit = 1.0 - math.pow(1.0 - 1.0 / 4096.0, 3.0 * nKeys)
    val theory = math.pow(pBit, 3)
    val sigma = math.sqrt(theory * (1 - theory) / 1000.0)
    assert(math.abs(fpr - theory) < 4 * sigma + 0.1 * theory,
      s"measured $fpr vs theory $theory")
    // The bit population is itself a binomial draw around m·p_bit.
    assert(math.abs(bitsSet - 4096.0 * pBit) < 4 * math.sqrt(4096.0 * pBit))
  }
}
