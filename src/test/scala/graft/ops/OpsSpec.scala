package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with engineered near-dups: doc 2i+1 is a light edit of doc 2i
    * for the first `dupPairs` pairs; the rest are distinct random texts.
    */
  private def corpus(n: Int, dupPairs: Int) = {
    val rng = new scala.util.Random(3)
    val vocab = Vector.tabulate(200)(i => s"w$i")
    def text() = Seq.fill(60)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    val docs = Array.tabulate(n)(i => (i.toLong, text()))
    (0 until n).foreach { i =>
      if (i % 2 == 1 && i / 2 < dupPairs) { // near-dup of previous doc
        val toks = docs(i - 1)._2.split(" ")
        toks(30) = "CHANGED"
        docs(i) = (i.toLong, toks.mkString(" "))
      }
    }
    docs.toSeq.toDF("doc_id", "text")
  }

  test("LSH candidates recall all high-Jaccard pairs") {
    val docs = corpus(40, dupPairs = 8)
    val exact = Dedup.exactJaccardPairs(docs, shingleLen = 5)
      .filter(col("jaccard") >= 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(exact.size == 8, s"expected 8 engineered pairs, got ${exact.size}")

    val cands = Dedup.lshCandidates(
      Dedup.minhashSignatures(Dedup.shingles(docs, "text", 5), 32), 8, 4)
      .as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(cands),
      s"missed pairs: ${exact.diff(cands)}")
  }

  test("estimated Jaccard tracks exact Jaccard on near-dups") {
    val docs = corpus(20, dupPairs = 4)
    val nd = Dedup.nearDuplicates(docs, minJaccard = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(nd.length >= 4)
    nd.foreach { case (d1, d2, est) =>
      assert(d2 == d1 + 1 && d1 % 2 == 0,
        s"false positive pair ($d1,$d2)")
      assert(est > 0.6, s"estimate $est too low for an engineered near-dup")
    }
  }

  test("embedding near-dup finds planted duplicate vectors") {
    val rng = new scala.util.Random(11)
    def vec() = Array.fill(16)(rng.nextGaussian().toFloat)
    val base = (0 until 20).map(_ => vec())
    // Plant: vector 20 = tiny perturbation of vector 0.
    val planted = base(0).map(x => x + 0.001f)
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } :+
      (20L, planted)
    val df = rows.toDF("vec_id", "embedding")

    val pairs = Dedup.embeddingNearDuplicates(df, "vec_id", "embedding",
      minCosine = 0.99)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 20L)), s"planted pair missing from $pairs")
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** Clustered vectors: 4 well-separated Gaussian clusters in 16-d. */
  private def clustered(n: Int) = {
    val rng = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian() * 5))
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks same-cluster vectors first") {
    val df = clustered(80)
    val queries = df.filter($"vec_id" < 4)
    val knn = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    // Same cluster ⇔ same vec_id mod 4.
    knn.foreach { case (q, nb) =>
      assert(nb % 4 == q % 4, s"neighbor $nb not in query $q's cluster")
    }
  }

  test("LSH ANN reaches high recall against brute force") {
    val df = clustered(200).cache()
    val queries = df.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(df, queries, "vec_id", "embedding", 5,
      planes = 10, probes = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below 0.8")
    df.unpersist()
  }

  test("cosine column expression matches a Scala-side computation") {
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 1.0f), Array(1.0f, 1.0f)),
      (3L, Array(1.0f, 0.0f), Array(-1.0f, 0.0f))).toDF("id", "a", "b")
    val got = df.select($"id", Similarity.cosine($"a", $"b").as("c"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 0.0) < 1e-12)
    assert(math.abs(got(2L) - 1.0) < 1e-12)
    assert(math.abs(got(3L) + 1.0) < 1e-12)
  }

  test("int8 quantization bounds components and reconstructs closely") {
    val df = clustered(50)
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
    val bad = q.select(explode($"qvec").as("c"))
      .filter($"c" > 127 || $"c" < -127).count()
    assert(bad == 0, s"$bad components outside [-127,127]")

    // Round-to-nearest reconstruction bound: |x - q*scale| ≤ scale/2 for
    // every component — the invariant that caps the cosine error.
    val orig = df.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    q.collect().foreach { r =>
      val id = r.getLong(0)
      val scale = r.getDouble(1)
      val qv = r.getSeq[Int](2)
      val x = orig(id)
      qv.indices.foreach { i =>
        val err = math.abs(x(i).toDouble - qv(i) * scale)
        assert(err <= scale / 2 + 1e-12,
          s"vec $id comp $i: err $err > scale/2 ${scale / 2}")
      }
    }
  }

  test("sorted_intersect_count matches Scala set intersection") {
    val rng = new scala.util.Random(13)
    val rows = (0 until 40).map { i =>
      val a = Array.fill(rng.nextInt(50) + 1)(rng.nextInt(60).toLong)
        .distinct.sorted
      val b = Array.fill(rng.nextInt(50) + 1)(rng.nextInt(60).toLong)
        .distinct.sorted
      (i.toLong, a, b, a.toSet.intersect(b.toSet).size.toLong)
    }
    val got = rows.toDF("id", "a", "b", "want")
      .select($"id", $"want",
        graft.expressions.SortedIntersectCount($"a", $"b").as("got"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, want, g) => assert(g == want, s"row $id: $g != $want") }
  }

  test("native quantized_dot is bit-identical to the declarative spelling") {
    val rng = new scala.util.Random(11)
    val df = (0 until 50).map { i =>
      (i.toLong, Array.fill(64)(rng.nextInt(255) - 127),
        Array.fill(64)(rng.nextInt(255) - 127))
    }.toDF("id", "a", "b")
    val both = df.select(
      graft.expressions.QuantizedDot($"a", $"b").as("native"),
      aggregate(zip_with($"a", $"b", (x, y) => x.cast("long") * y),
        lit(0L), (acc, x) => acc + x).as("declarative"))
      .as[(Long, Long)].collect()
    both.foreach { case (n, d) => assert(n == d, s"$n != $d") }
  }

  test("quantized top-k reaches high recall against exact brute force") {
    val df = clustered(200).cache()
    val queries = df.filter($"vec_id" < 8)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val quant = Similarity.quantizeInt8(df, "vec_id", "embedding").cache()
    val approx = Similarity.quantizedTopK(
      quant, quant.filter($"vec_id" < 8), "vec_id", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"quantized recall $recall below 0.8")
    df.unpersist(); quant.unpersist()
  }
}

class MultimodalSpec extends SparkSpec {

  test("image features stream through typed mapPartitions") {
    val media = Multimodal.syntheticMedia(spark, 9, 16, 16)
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.length == 6) // 2 of 3 kinds are images
    feats.foreach { f =>
      assert(f.mean_intensity >= 0 && f.mean_intensity <= 255)
      assert(f.intensity_histogram.sum == 16 * 16)
    }
  }

  test("image features decode a real PNG payload via javax.imageio") {
    import spark.implicits._
    // 16×16 gray gradient PNG, written by the JDK encoder: row r has
    // luminance r*16 (so mean = 120 and the histogram is uniform).
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (r <- 0 until 16; c <- 0 until 16) {
      val v = r * 16
      img.setRGB(c, r, (v << 16) | (v << 8) | v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    // Metadata width/height deliberately wrong (1×1): the decoded header
    // must win for a real image payload.
    val media = Seq(
      Multimodal.MediaRow(42L, "image", baos.toByteArray, 1, 1, 0, 1)).toDS()

    val f = Multimodal.imageFeatures(media).collect().head
    assert(f.width == 16 && f.height == 16, s"decoded dims ${f.width}x${f.height}")
    assert(math.abs(f.mean_intensity - 120.0) < 0.5, s"mean ${f.mean_intensity}")
    assert(f.intensity_histogram.sum == 256)
    assert(f.intensity_histogram.forall(_ == 16),
      s"gradient rows must fill all 16 bins: ${f.intensity_histogram.mkString(",")}")
  }

  test("resize updates payload and metadata consistently") {
    val media = Multimodal.syntheticMedia(spark, 3, 16, 16)
    val resized = Multimodal.resizeImages(media, 8, 8).collect()
    resized.filter(_.kind == "image").foreach { m =>
      assert(m.width == 8 && m.height == 8)
      assert(m.payload.length == 64)
    }
  }

  test("audio fingerprints link exactly the planted chord groups") {
    // 6 groups × 4 jittered members: near-dup pairs must be EXACTLY the
    // within-group pairs (gain/phase jitter cancels in the spectrum) and
    // never a cross-group pair (distinct chords share ~1 of 8 bands, so
    // Hamming distance lands far above the threshold).
    val sigs = Multimodal.audioFingerprints(
      Multimodal.syntheticAudioVariants(spark, groups = 6, perGroup = 4))
    val pairs = graft.ops.Dedup
      .hammingPairs(graft.ops.Dedup.simhashCandidatePairs(sigs), sigs)
      .filter(org.apache.spark.sql.functions.col("hamming") <= 3)
      .collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    val expected = (for {
      g <- 0 until 6
      a <- 0 until 4
      b <- a + 1 until 4
    } yield (g * 4L + a, g * 4L + b)).toSet
    assert(pairs == expected,
      s"missing=${expected -- pairs} spurious=${pairs -- expected}")
  }

  test("frame sampling slices video payloads per frame") {
    val media = Multimodal.syntheticMedia(spark, 9, 8, 8)
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    // 3 videos × frames {0, 2} of 4.
    assert(frames.length == 6)
    assert(frames.forall(_.payload.length == 64))
  }

  test("per-frame stats match a direct byte-loop computation") {
    val media = Multimodal.syntheticMedia(spark, 9, 8, 8)
    val got = Multimodal.frameStats(media, stride = 2).collect()
      .map(f => (f.media_id, f.frame_idx) -> (f.n_bytes, f.mean_intensity))
      .toMap
    val want = Multimodal.sampleFrames(media, stride = 2).collect().map { f =>
      val mean = f.payload.map(b => (b & 0xff).toDouble).sum / f.payload.length
      (f.media_id, f.frame_idx) -> ((f.payload.length, mean))
    }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, m)) =>
      assert(n == want(k)._1)
      assert(math.abs(m - want(k)._2) < 1e-9, s"$k: $m vs ${want(k)._2}")
    }
  }

  test("media stats rollup") {
    val media = Multimodal.syntheticMedia(spark, 9, 8, 8).toDF()
    val stats = Multimodal.mediaStats(media).collect()
      .map(r => r.getAs[String]("kind") -> r.getAs[Long]("n_items")).toMap
    assert(stats == Map("image" -> 6L, "video" -> 3L))
  }

  test("video frame-hash near-dup links exactly the planted clip groups") {
    import org.apache.spark.sql.functions._
    // 6 groups × 4 members: per-frame perturbed copies must pair up at
    // clip level (frame-aligned mean Hamming <= 6) and unrelated clips
    // must not — even if a coincidental 16-bit frame chunk collides, the
    // clip-level verify rejects it.
    val fh = Multimodal.videoFrameHashes(
      Multimodal.syntheticVideoVariants(spark, groups = 6, perGroup = 4),
      stride = 2)
    val pairs = Multimodal.videoNearDupPairs(fh)
      .filter(col("avg_hamming") <= 6.0)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (for {
      g <- 0 until 6
      a <- 0 until 4
      b <- a + 1 until 4
    } yield (g * 4L + a, g * 4L + b)).toSet
    assert(pairs == expected,
      s"missing=${expected -- pairs} spurious=${pairs -- expected}")
  }

  test("short video payloads hash only complete frames, without failing") {
    import spark.implicits._
    // A malformed row whose payload holds 2.5 of the declared 4 frames
    // must contribute its 2 complete frames — not kill the task on a
    // short final slice. A zero-area row contributes nothing.
    val w = 8; val h = 8; val fb = w * h
    val rows = Seq(
      Multimodal.MediaRow(0, "video", new Array[Byte](fb * 4), w, h, 0, 4),
      Multimodal.MediaRow(1, "video", new Array[Byte](fb * 2 + fb / 2), w, h, 0, 4),
      Multimodal.MediaRow(2, "video", new Array[Byte](0), 0, 0, 0, 4))
    val got = Multimodal.videoFrameHashes(spark.createDataset(rows), stride = 1)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 4L, 1L -> 2L), got.toString)
  }

  test("malformed media rows degrade instead of failing the task") {
    import spark.implicits._
    val w = 8; val h = 8; val fb = w * h
    val rows = Seq(
      // Video declaring 4 frames but holding 2.5: frames 0 and 1 are
      // full, frame 2 is the short final slice, frame 3 must not throw
      // from copyOfRange.
      Multimodal.MediaRow(0, "video", new Array[Byte](fb * 2 + fb / 2),
        w, h, 0, 4),
      // Zero-area video row: nothing to slice.
      Multimodal.MediaRow(1, "video", new Array[Byte](5), 0, 0, 0, 3),
      // Empty / sub-sample audio payloads: not one full PCM16 sample —
      // ineligible, like sample_rate <= 0.
      Multimodal.MediaRow(2, "audio", new Array[Byte](0), 0, 0, 4000, 0),
      Multimodal.MediaRow(3, "audio", Array[Byte](7), 0, 0, 4000, 0),
      // A healthy audio row in the same partition must still process.
      Multimodal.MediaRow(4, "audio",
        Array.tabulate(800)(i => (i % 120).toByte), 0, 0, 4000, 0))
    val ds = spark.createDataset(rows)
    val frames = Multimodal.sampleFrames(ds, stride = 1).collect()
    assert(frames.map(f => (f.media_id, f.frame_idx, f.payload.length)).toSet
      == Set((0L, 0, fb), (0L, 1, fb), (0L, 2, fb / 2)), frames.mkString(","))
    val af = Multimodal.audioFeatures(ds).collect()
    assert(af.map(_.media_id).toSeq == Seq(4L))
    assert(af.head.n_samples == 400)
    val fp = Multimodal.audioFingerprints(ds).collect()
    assert(fp.map(_.getLong(0)).toSeq == Seq(4L))

    // Image rows: a truncated PNG container (magic intact, data gone), a
    // raw raster shorter than its declared dims, and a zero-area row are
    // all SKIPPED by the image kernels; the healthy raster in the same
    // partition still hashes/extracts/resizes.
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val truncatedPng = baos.toByteArray.take(40)
    val imgs = spark.createDataset(Seq(
      Multimodal.MediaRow(10, "image", truncatedPng, 16, 16, 0, 1),
      Multimodal.MediaRow(11, "image", new Array[Byte](10), w, h, 0, 1),
      Multimodal.MediaRow(12, "image", new Array[Byte](0), 0, 0, 0, 1),
      Multimodal.MediaRow(13, "image", new Array[Byte](fb), w, h, 0, 1)))
    assert(Multimodal.imageHashes(imgs).collect()
      .map(_.getLong(0)).toSeq == Seq(13L))
    assert(Multimodal.imageFeatures(imgs).collect()
      .map(_.media_id).toSeq == Seq(13L))
    val resized = Multimodal.resizeImages(imgs, 4, 4).collect()
    assert(resized.map(_.media_id).toSeq == Seq(13L))
    assert(resized.head.payload.length == 16)
  }

  test("Int-overflow raster dims are rejected catchably, never allocated") {
    import spark.implicits._
    // 65537×65537 overflows Int to 131073: an Int-math payload guard
    // passes it and Array.tabulate then attempts a multi-GB allocation —
    // an OutOfMemoryError the NonFatal skip contract cannot intercept.
    // The Long-math guard must reject hostile dims as a catchable
    // IllegalArgumentException so the bulk kernels skip the row.
    val w = 65537
    val payload = new Array[Byte](200000) // > 131073, passes the Int guard
    intercept[IllegalArgumentException](
      Multimodal.FakeCodec.decode(payload, w, w))
    // Two negative dims: positive product, still not a raster.
    intercept[IllegalArgumentException](
      Multimodal.FakeCodec.decode(payload, -3, -5))
    val rows = Seq(
      Multimodal.MediaRow(0, "image", payload, w, w, 0, 1),
      Multimodal.MediaRow(1, "video", payload, w, w, 0, 4),
      Multimodal.MediaRow(2, "video", payload, -3, -5, 0, 4),
      Multimodal.MediaRow(3, "image", new Array[Byte](64), 8, 8, 0, 1))
    val ds = spark.createDataset(rows)
    assert(Multimodal.imageFeatures(ds).collect().map(_.media_id).toSeq
      == Seq(3L))
    assert(Multimodal.imageHashes(ds).collect().map(_.getLong(0)).toSeq
      == Seq(3L))
    // sampleFrames tolerates partial slices by contract, so the overflowed
    // row yields ONE slice bounded by its actual payload — never a 4 GB
    // frame; the hash kernel (complete frames only) yields nothing.
    assert(Multimodal.sampleFrames(ds, 1).collect()
      .map(f => (f.media_id, f.frame_idx, f.payload.length)).toSeq
      == Seq((1L, 0, 200000)))
    assert(Multimodal.videoFrameHashes(ds, 1).collect().isEmpty)
  }

  test("clip verify needs >=2 aligned frames: one colliding frame is not a pair") {
    import spark.implicits._
    // Unequal-length clips: clip 0 has 4 sampled frames, clip 1 only one —
    // and that one frame's hash collides EXACTLY. The mean-Hamming over
    // shared indices is 0, so without the evidence floor this would pass
    // any threshold on a single coincidence.
    val fh = Seq(
      (0L, 0, 0x1234L), (0L, 1, 0x9999L), (0L, 2, 0x5678L), (0L, 3, 0x4242L),
      (1L, 0, 0x1234L),
      // Control: a genuine pair aligned on two frames must survive.
      (2L, 0, 0xAAAAL), (2L, 1, 0xBBBBL),
      (3L, 0, 0xAAAAL), (3L, 1, 0xBBBBL))
      .toDF("media_id", "frame_idx", "fhash")
    val pairs = Multimodal.videoNearDupPairs(fh)
      .filter(org.apache.spark.sql.functions.col("avg_hamming") <= 6.0)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)), pairs.toString)
  }

  test("perceptual-hash near-dup finds exactly the planted image pairs") {
    import org.apache.spark.sql.functions.col
    val sigs = Multimodal.imageHashes(Multimodal.syntheticImages(spark, 90))
      .select(col("media_id").as("doc_id"), col("ahash").as("simhash"))
    val pairs = Dedup.hammingPairs(Dedup.simhashCandidatePairs(sigs), sigs)
      .filter(col("hamming") <= 6)
      .select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // 30 groups of (base, 5-pixel perturbation, unrelated): detection must
    // be exactly the 30 planted (3g, 3g+1) pairs — full recall, zero false
    // positives against the unrelated rasters.
    val planted = (0L until 30L).map(g => (3 * g, 3 * g + 1)).toSet
    assert(pairs == planted, s"got ${pairs.size} pairs, want 30 planted")
  }
}

class SimhashDedupSpec extends graft.SparkSpec {
  import spark.implicits._

  test("simhash near-dup finds light edits and candidates cover Hamming<=3") {
    val rng = new scala.util.Random(7)
    val vocab = Vector.tabulate(400)(i => s"w$i")
    def text() = Seq.fill(80)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    // Docs 2i/2i+1 are 1-token edits for the first 6 pairs.
    val docs = Array.tabulate(50)(i => (i.toLong, text()))
    (0 until 50).foreach { i =>
      if (i % 2 == 1 && i / 2 < 6) {
        val t = docs(i - 1)._2.split(" ")
        t(40) = "CHANGED"
        docs(i) = (i.toLong, t.mkString(" "))
      }
    }
    val df = docs.toSeq.toDF("doc_id", "text")

    val sigs = Dedup.simhash64(df).persist()
    // Exact Hamming ≤ 3 ground truth from all pairs of signatures.
    val all = Dedup.hammingPairs(
      sigs.select(col("doc_id").as("d1")).crossJoin(
        sigs.select(col("doc_id").as("d2"))).filter(col("d1") < col("d2")),
      sigs).filter(col("hamming") <= 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

    val found = Dedup.simhashNearDuplicates(df, maxHamming = 3)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // Pigeonhole: 4 chunks recall EVERY pair at Hamming ≤ 3.
    assert(found.nonEmpty)
    assert(found == all, s"missed: ${all.diff(found)}, extra: ${found.diff(all)}")
    // The engineered one-token edits all sit at SMALL Hamming distance
    // (one vote stream of 80 changed), far from random pairs (~32 expected)
    // — though not always ≤ 3, which is why maxHamming is a dial.
    val planted = (0 until 6).map(i => (2L * i, 2L * i + 1)).toSet
    val plantedHam = Dedup.hammingPairs(
      planted.toSeq.toDF("d1", "d2"), sigs)
      .as[(Long, Long, Int)].collect()
    assert(plantedHam.length == 6)
    plantedHam.foreach { case (d1, d2, h) =>
      assert(h <= 12, s"planted pair ($d1,$d2) at hamming $h — not near")
    }
    sigs.unpersist()
  }
}

class SkewDedupSpec extends graft.SparkSpec {
  import spark.implicits._

  test("hot-shingle cap removes boilerplate but keeps true near-dups") {
    val rng = new scala.util.Random(9)
    val boiler = "all rights reserved to the original author of this work"
    def body() = Seq.fill(40)(s"w${rng.nextInt(500)}").mkString(" ")
    // Every doc shares the boilerplate; docs 0/1 are true near-dups.
    val base = body()
    val docs = (0 until 30).map { i =>
      val text = if (i == 1) base + " EXTRA" else if (i == 0) base else body()
      (i.toLong, s"$boiler $text")
    }.toDF("doc_id", "text")

    val sh = Dedup.shingles(docs, "text", 5)
    val capped = Dedup.capShingleFrequency(sh, maxDocFreq = 10)
    // Boilerplate shingles (in all 30 docs) are gone.
    val maxFreq = capped.groupBy("shingle").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(maxFreq <= 10)

    val nd = Dedup.nearDuplicates(docs, minJaccard = 0.5, maxShingleDocFreq = 10)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(nd.contains((0L, 1L)), s"true near-dup lost: $nd")
    // Without the cap, every pair shares boilerplate shingles; with it,
    // unrelated docs stop being candidates at the estimate threshold.
    assert(nd.size < 20, s"boilerplate still causing pair blowup: ${nd.size}")
  }

  test("viral band bucket star-expands: candidate volume stays linear") {
    // 100 byte-identical docs (a mass-duplicated page): every band bucket
    // holds all 100, so the naive band join would emit 100·99/2 = 4 950
    // pairs PER BAND. The bucket cap (default 64) star-expands oversized
    // buckets against their min-doc representative instead — candidates stay
    // n-1, and the duplicate group remains fully discoverable through doc 0.
    // (100 sits below the shingle-frequency cap's default 128, so that guard
    // stays out of the way; beyond IT, a fully-boilerplate group vanishes
    // from LSH entirely — mass-exact duplicates are exact-hash dedup's job,
    // t1.)
    val dupText = (0 until 40).map(i => s"tok$i").mkString(" ")
    val rng = new scala.util.Random(17)
    val docs = ((0 until 100).map(i => (i.toLong, dupText)) ++
      (100 until 130).map(i =>
        (i.toLong, Seq.fill(40)(s"w${rng.nextInt(800)}").mkString(" "))))
      .toDF("doc_id", "text")

    val cands = Dedup.candidatePairs(docs).as[(Long, Long)].collect()
    val dupCands = cands.filter { case (d1, d2) => d1 < 100 && d2 < 100 }
    assert(dupCands.length == 99, s"expected 99 star pairs, got ${dupCands.length}")
    assert(dupCands.forall(_._1 == 0L), "star pairs must anchor on the min doc_id")

    // The estimate stage confirms them as duplicates (signatures identical).
    val nd = Dedup.nearDuplicates(docs, minJaccard = 0.9)
      .select("d1", "d2").as[(Long, Long)].collect()
    assert(nd.count { case (d1, d2) => d1 == 0L && d2 < 100 } == 99,
      "duplicate group must survive estimation at jaccard 0.9")
  }
}

class AudioSpec extends graft.SparkSpec {
  import spark.implicits._

  test("audio features: RMS, ZCR and dominant frequency from PCM16 payload") {
    val sr = 8000
    // 440 Hz sine at half amplitude, 1 second, PCM16 LE.
    val samples = Array.tabulate(sr)(i =>
      (16384 * math.sin(2 * math.Pi * 440 * i / sr)).toShort)
    val payload = new Array[Byte](sr * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      payload(2 * i) = (s & 0xff).toByte
      payload(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val media = Seq(Multimodal.MediaRow(7L, "audio", payload, 0, 0, sr, 0)).toDS()

    val f = Multimodal.audioFeatures(media).collect().head
    assert(f.n_samples == sr)
    // RMS of a half-amplitude sine = 0.5 / sqrt(2) ≈ 0.3536.
    assert(math.abs(f.rms - 0.3536) < 0.01, s"rms ${f.rms}")
    // A 440 Hz tone crosses zero 880 times per second.
    assert(math.abs(f.zero_crossing_rate * sr - 880) < 10,
      s"zcr ${f.zero_crossing_rate}")
    // Welch bin resolution at 8 kHz / 256 = 31.25 Hz.
    assert(math.abs(f.dominant_freq_hz - 440) < 32,
      s"dominant ${f.dominant_freq_hz}")
  }

  test("non-audio rows are excluded") {
    val media = Multimodal.syntheticMedia(spark, 6)
    assert(Multimodal.audioFeatures(media).count() == 0)
  }

  test("WAV container round-trips: format comes from the header, not metadata") {
    val sr = 8000
    val x = Array.tabulate(sr)(i => 0.5 * math.sin(2 * math.Pi * 440 * i / sr))
    val wav = Multimodal.WavCodec.encode(x, sr)
    // Codec-level round trip within PCM16 quantization.
    val (y, rate) = Multimodal.WavCodec.decode(wav)
    assert(rate == sr && y.length == sr)
    assert(x.indices.forall(i => math.abs(x(i) - y(i)) < 1e-4))
    // Kernel-level: metadata sample_rate deliberately WRONG (0 would make
    // a raw-PCM row ineligible) — the container's rate must win.
    val media = Seq(Multimodal.MediaRow(1L, "audio", wav, 0, 0, 0, 0)).toDS()
    val f = Multimodal.audioFeatures(media).collect().head
    assert(f.sample_rate == sr && f.n_samples == sr)
    assert(math.abs(f.rms - 0.3536) < 0.01, s"rms ${f.rms}")
    assert(math.abs(f.dominant_freq_hz - 440) < 32,
      s"dominant ${f.dominant_freq_hz}")
  }

  test("WAV: stereo downmix, fingerprint parity with raw PCM, malformed skip") {
    val sr = 4000
    val x = Array.tabulate(sr)(i => 0.4 * math.sin(2 * math.Pi * 250 * i / sr))

    // Stereo container with an extra LIST chunk between fmt and data
    // (chunk-walk coverage); right channel = -left, so the per-frame
    // downmix must cancel to ~0.
    def stereoWav(l: Array[Double], r: Array[Double]): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      val dataLen = l.length * 4
      val buf = java.nio.ByteBuffer.allocate(44 + 12 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(ascii)).putInt(48 + dataLen)
        .put("WAVE".getBytes(ascii))
      buf.put("fmt ".getBytes(ascii)).putInt(16).putShort(1).putShort(2)
      buf.putInt(sr).putInt(sr * 4).putShort(4).putShort(16)
      buf.put("LIST".getBytes(ascii)).putInt(4).put("INFO".getBytes(ascii))
      buf.put("data".getBytes(ascii)).putInt(dataLen)
      l.indices.foreach { i =>
        buf.putShort((l(i) * 32767).toShort)
        buf.putShort((r(i) * 32767).toShort)
      }
      buf.array()
    }
    val (mix, rate) = Multimodal.WavCodec.decode(stereoWav(x, x.map(-_)))
    assert(rate == sr && mix.length == sr)
    assert(mix.forall(v => math.abs(v) < 1e-4), "downmix of l, -l must cancel")

    // Fingerprint parity: the same tone as a WAV (bogus metadata rate)
    // and as raw PCM16 (metadata rate) must hash identically — both
    // decode to the same samples at the same rate.
    val pcm = new Array[Byte](sr * 2)
    x.indices.foreach { i =>
      val s = (x(i) * 32767).toShort
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val media = Seq(
      Multimodal.MediaRow(0L, "audio", Multimodal.WavCodec.encode(x, sr),
        0, 0, 0, 0),
      Multimodal.MediaRow(1L, "audio", pcm, 0, 0, sr, 0),
      // Truncated container (magic intact, data clipped): skipped.
      Multimodal.MediaRow(2L, "audio",
        Multimodal.WavCodec.encode(x, sr).take(200), 0, 0, sr, 0)).toDS()
    val fps = Multimodal.audioFingerprints(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.keySet == Set(0L, 1L), fps.toString)
    assert(fps(0L) == fps(1L), "WAV and raw-PCM fingerprints diverge")
    assert(Multimodal.audioFeatures(media).collect().map(_.media_id).toSet
      == Set(0L, 1L))
  }
}

class IvfSpec extends graft.SparkSpec {
  import spark.implicits._

  test("IVF-probed search reaches high recall against brute force") {
    val rng = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian() * 5))
    val df = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding").cache()
    val queries = df.filter($"vec_id" < 8)

    val seeds = Similarity.sampleCentroids(df, "vec_id", "embedding", 8)
    val centroids = Similarity.kmeansStep(df, "embedding",
      Similarity.kmeansStep(df, "embedding", seeds))

    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(df, queries, "vec_id", "embedding", 5,
      centroids, nProbe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
    df.unpersist()
  }

  test("IVF cell assignment routes vectors to their nearest centroid") {
    val centroids = Array(
      Array.fill(8)(5.0),   // cell 0: all +5
      Array.fill(8)(-5.0),  // cell 1: all -5
      Array.tabulate(8)(i => if (i < 4) 5.0 else -5.0)) // cell 2: mixed
    val rng = new scala.util.Random(13)
    val rows = (0 until 90).map { i =>
      val c = centroids(i % 3)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.5).toFloat))
    }.toDF("vec_id", "embedding")

    val assigned = Similarity.ivfAssign(rows, "embedding", centroids)
      .select("vec_id", "cell").as[(Long, Int)].collect()
    assigned.foreach { case (id, cell) =>
      assert(cell == (id % 3).toInt, s"vector $id routed to cell $cell")
    }
  }
}

class PqSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions.col

  /** 4 well-separated clusters in 16-d, float vectors. */
  private def clustered(n: Int) = {
    val rng = new scala.util.Random(5)
    val centers = Array.fill(4)(Array.fill(16)(rng.nextGaussian() * 5))
    (0 until n).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rng.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("PQ shortlist+rerank search reaches high recall against brute force") {
    val df = clustered(200).cache()
    val queries = df.filter($"vec_id" < 8)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding",
      subspaces = 4, codes = 16, iters = 2)
    val coded = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.pqSearchTopK(coded, queries, df, "vec_id",
      "embedding", cb, k = 5, shortlist = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall below 0.8")
    df.unpersist()
  }

  test("raw ADC top-5 underperforms the reranked search (shortlist rationale)") {
    // Coarse codes tie same-cell vectors, so raw ADC@5 recall is structurally
    // poor — the property that makes the rerank stage part of the operator,
    // not an optimization.
    val df = clustered(200).cache()
    val queries = df.filter($"vec_id" < 8)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding",
      subspaces = 4, codes = 16, iters = 2)
    val coded = Similarity.pqEncode(df, "vec_id", "embedding", cb)
    val exact = Similarity.bruteForceTopK(df, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val adcOnly = Similarity.pqAdcTopK(coded, queries, "vec_id", "embedding",
      cb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val reranked = Similarity.pqSearchTopK(coded, queries, df, "vec_id",
      "embedding", cb, k = 5, shortlist = 50)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val rAdc = exact.intersect(adcOnly).size.toDouble / exact.size
    val rRerank = exact.intersect(reranked).size.toDouble / exact.size
    assert(rRerank > rAdc,
      s"rerank recall $rRerank should beat raw ADC recall $rAdc")
    df.unpersist()
  }

  test("ADC score equals dot(query, reconstruction) computed Scala-side") {
    val df = clustered(60).cache()
    val queries = df.filter($"vec_id" < 3)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding",
      subspaces = 4, codes = 8, iters = 1)
    val coded = Similarity.pqEncode(df, "vec_id", "embedding", cb)

    val codesOf = coded.select($"vec_id", $"codes").as[(Long, Seq[Int])]
      .collect().toMap
    val vecOf = df.select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect().toMap

    val got = Similarity.pqAdcTopK(coded, queries, "vec_id", "embedding",
      cb, k = 5, roundTo = 6)
      .select("query_id", "neighbor_id", "adc_score")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (q, nb, score) =>
      // reconstruction = concat of the coded centroids; ADC score must be
      // the plain dot of the full query vector with that reconstruction.
      val recon = codesOf(nb).zipWithIndex.flatMap { case (code, m) =>
        cb(m)(code)
      }
      val qv = vecOf(q).map(_.toDouble)
      var expected = 0.0
      var i = 0
      while (i < qv.length) { expected += qv(i) * recon(i); i += 1 }
      assert(math.abs(score - math.rint(expected * 1e6) / 1e6) < 1e-9,
        s"query $q neighbor $nb: adc $score vs reconstruction dot $expected")
    }
    df.unpersist()
  }

  test("native pq_codes is bit-identical to the declarative argmax spelling") {
    import org.apache.spark.sql.functions.{array, lit, slice}
    val df = clustered(120)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding",
      subspaces = 4, codes = 8, iters = 1)
    val subDim = cb(0)(0).length
    val declared = df.select($"vec_id",
      array(cb.indices.map { m =>
        Similarity.pqSubCode(
          slice($"embedding", m * subDim + 1, subDim).cast("array<double>"),
          cb(m))
      }: _*).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    val native = Similarity.pqEncode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(native == declared)
  }

  test("PQ encode routes each subspace to its nearest centroid") {
    // Hand-built codebook with obvious nearest cells per subspace.
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(5.0, 5.0), Array(-5.0, -5.0)),
      Array(Array(0.0, 9.0), Array(0.0, -9.0)))
    val rows = Seq(
      (0L, Array(4.8f, 5.1f, 0.2f, 8.7f)),  // sub0→code0, sub1→code0
      (1L, Array(-5.2f, -4.9f, -0.1f, -9.3f)), // sub0→code1, sub1→code1
      (2L, Array(5.3f, 4.6f, 0.0f, -8.8f))  // sub0→code0, sub1→code1
    ).toDF("vec_id", "embedding")
    val got = Similarity.pqEncode(rows, "vec_id", "embedding", cb)
      .orderBy(col("vec_id")).select("codes").as[Seq[Int]].collect()
    assert(got(0) == Seq(0, 0))
    assert(got(1) == Seq(1, 1))
    assert(got(2) == Seq(0, 1))
  }
}
