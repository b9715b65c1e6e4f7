package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Stage}
import graft.ops.{Dedup, Multimodal}
import OpsShared._

/** Multimodal operators (m1-m7): media metadata rollups, image/audio
  * feature extraction, frame sampling, and perceptual near-dup for
  * images, audio, and video. Split out of the former `OpsQueries`
  * monolith unchanged; staging/oracle contract in [[OpsQueries]]'s doc.
  */
object OpsMediaQueries {

  /** Multimodal metadata rollup: the synthetic media table's typed metadata
    * (payload length computed Spark-side from the binary column) is staged,
    * then both engines aggregate it — the relational face of the multimodal
    * table is hash-verified; decode plumbing stays spec-verified
    * (MultimodalSpec).
    */
  val mediaStats = Q(
    "m1_media_stats",
    (s, dir) => {
      val meta = Multimodal.syntheticMedia(s, 300).toDF()
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("n_bytes"),
          col("width"), col("height"), col("sample_rate"), col("n_frames"))
      Stage.through(meta, dir, "m1_media_meta")
        .groupBy("kind")
        .agg(
          count(lit(1)).as("n_items"),
          sum("n_bytes").as("total_bytes"),
          graft.Norm.rz(avg("n_bytes"), 6).as("avg_bytes"),
          max("width").as("max_width"),
          max("n_frames").as("max_frames"))
        .orderBy("kind")
    },
    Some(
      s"""select kind,
         |  count(*) as n_items,
         |  cast(sum(n_bytes) as bigint) as total_bytes,
         |  round(avg(n_bytes), 6) + 0.0 as avg_bytes,
         |  max(width) as max_width,
         |  max(n_frames) as max_frames
         |from ${Stage.sqlPath("m1_media_meta")}
         |group by kind
         |order by kind""".stripMargin),
    "multimodal: binary-column metadata rollup (staged metadata, hash-verified)")

  /** Decode-in-the-loop image features: the synthetic media table's image
    * payloads run through the REAL decode path ([[Multimodal.imageFeatures]]
    * — `javax.imageio` for container formats, raw-raster fallback for the
    * synthetic payloads) inside typed `mapPartitions`; the per-image
    * features (decoded dims, mean luma, 16-bin histogram) are staged, and
    * both engines independently roll them up into intensity bands — so the
    * decode plumbing is exercised in the query path, not just in specs, and
    * everything downstream of the codec is hash-verified.
    */
  val imageFeatures = Q(
    "m2_image_features",
    (s, dir) => {
      val feats = Multimodal.imageFeatures(Multimodal.syntheticMedia(s, 300))
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          graft.Norm.rz(col("mean_intensity"), 6).as("mean_intensity"),
          col("intensity_histogram"))
      Stage.through(feats, dir, "m2_image_feats")
        .groupBy(floor(col("mean_intensity") / 16).cast("int")
          .as("intensity_band"))
        .agg(
          count(lit(1)).as("n_images"),
          graft.Norm.rz(avg("mean_intensity"), 6).as("avg_intensity"),
          sum(element_at(col("intensity_histogram"), 1)).as("dark_pixels"),
          sum(element_at(col("intensity_histogram"), 16)).as("bright_pixels"))
        .orderBy("intensity_band")
    },
    Some(
      s"""select cast(floor(mean_intensity / 16) as int) as intensity_band,
         |  count(*) as n_images,
         |  round(avg(mean_intensity), 6) + 0.0 as avg_intensity,
         |  cast(sum(intensity_histogram[1]) as bigint) as dark_pixels,
         |  cast(sum(intensity_histogram[16]) as bigint) as bright_pixels
         |from ${Stage.sqlPath("m2_image_feats")}
         |group by 1
         |order by 1""".stripMargin),
    "multimodal: decode-in-the-loop image features (staged) + hash-verified band rollup")

  /** Video frame sampling: every 2nd frame of each synthetic video becomes
    * a row (typed mapPartitions slice — the payload never leaves the
    * executor), per-frame byte statistics are extracted in the same pass
    * and STAGED; the per-video rollup downstream of the staged frames is
    * hash-verified. The Spark-side plumbing (binary column, frame slicing,
    * stride) is the real thing; the "decode" is the documented synthetic
    * raster (this container ships no video codec).
    */
  val frameSample = Q(
    "m3_frame_sample",
    (s, dir) => {
      val frames = Multimodal.frameStats(Multimodal.syntheticMedia(s, 300), 2)
        .toDF()
        .select(col("media_id"), col("frame_idx"), col("n_bytes"),
          graft.Norm.rz(col("mean_intensity"), 6).as("mean_intensity"))
      Stage.through(frames, dir, "m3_frames")
        .groupBy("media_id")
        .agg(
          count(lit(1)).as("n_frames_sampled"),
          sum("n_bytes").as("total_bytes"),
          graft.Norm.rz(avg("mean_intensity"), 6).as("avg_intensity"),
          graft.Norm.rz(min("mean_intensity"), 6).as("min_intensity"),
          graft.Norm.rz(max("mean_intensity"), 6).as("max_intensity"))
        .orderBy("media_id")
    },
    Some(
      s"""select media_id, count(*) as n_frames_sampled,
         |  cast(sum(n_bytes) as bigint) as total_bytes,
         |  round(avg(mean_intensity), 6) + 0.0 as avg_intensity,
         |  round(min(mean_intensity), 6) + 0.0 as min_intensity,
         |  round(max(mean_intensity), 6) + 0.0 as max_intensity
         |from ${Stage.sqlPath("m3_frames")}
         |group by media_id
         |order by media_id""".stripMargin),
    "multimodal: stride frame sampling + per-frame stats (staged) + hash-verified per-video rollup")

  /** Audio feature extraction: deterministic PCM16 tones → per-row RMS /
    * zero-crossing rate / Welch dominant frequency (the SAME spectral
    * kernel that powers EEG band extraction), staged; the per-tone rollup
    * downstream is hash-verified. Completes the multimodal trio — image
    * (m2), video (m3), audio (m4) — each with its decode/extract step in
    * typed executor-side code and everything after it oracle-checked.
    */
  val audioFeatures = Q(
    "m4_audio_features",
    (s, dir) => {
      val feats = Multimodal.audioFeatures(Multimodal.syntheticAudio(s, 100))
        .toDF()
        .select(col("media_id"), col("sample_rate"), col("n_samples"),
          graft.Norm.rz(col("rms"), 6).as("rms"),
          graft.Norm.rz(col("zero_crossing_rate"), 6).as("zcr"),
          graft.Norm.rz(col("dominant_freq_hz"), 3).as("dominant_freq_hz"))
      Stage.through(feats, dir, "m4_audio_feats")
        .groupBy("dominant_freq_hz")
        .agg(
          count(lit(1)).as("n_clips"),
          graft.Norm.rz(avg("rms"), 6).as("avg_rms"),
          graft.Norm.rz(avg("zcr"), 6).as("avg_zcr"),
          min("media_id").as("min_media_id"))
        .orderBy("dominant_freq_hz")
    },
    Some(
      s"""select dominant_freq_hz, count(*) as n_clips,
         |  round(avg(rms), 6) + 0.0 as avg_rms,
         |  round(avg(zcr), 6) + 0.0 as avg_zcr,
         |  min(media_id) as min_media_id
         |from ${Stage.sqlPath("m4_audio_feats")}
         |group by dominant_freq_hz
         |order by dominant_freq_hz""".stripMargin),
    "multimodal: PCM16 decode + Welch dominant-freq features (staged) + hash-verified per-tone rollup")

  /** Image near-dup via perceptual hash: decode → 8×8 average-hash →
    * chunk-banded candidate pairs → Hamming verify — image dedup with the
    * exact machinery of d2 (a perceptual hash IS a 64-bit fingerprint to
    * the banded join). The synthetic corpus plants a near-duplicate in
    * every id-triple (five perturbed pixels — a re-encode analog), so the
    * expected pairs are known. ONLY the hashes (decode is not
    * DuckDB-reproducible) are staged — the d2 contract: chunk banding,
    * the bucket-size/star-cap skew guard, the candidate self-join AND
    * the Hamming verify are ALL recomputed independently by the oracle
    * from the staged 8-byte rows, so a banding bug that misses a planted
    * pair shows as a row mismatch, not a silently-trusted candidate set.
    * At 100 TB: one decode pass (payloads never leave executors), one
    * bounded band shuffle over 8-byte hashes — the payload bytes are
    * never joined.
    */
  val imageNearDup = Q(
    "m5_image_neardup",
    (s, dir) => {
      val sigs = Stage.through(
        Multimodal.imageHashes(Multimodal.syntheticImages(s, 300))
          .select(col("media_id").as("doc_id"), col("ahash").as("simhash")),
        dir, "m5_hashes")
      Dedup.hammingPairs(Dedup.simhashCandidatePairs(sigs), sigs)
        .filter(col("hamming") <= 6)
        .orderBy(col("hamming"), col("d1"), col("d2"))
    },
    Some(
      s"""with sigs as (
         |  select doc_id, simhash from ${Stage.sqlPath("m5_hashes")}
         |), ${candSqlCtes(SimhashBandedSelect, "doc_id")}
         |select c.d1, c.d2,
         |  cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
         |from cand c
         |join sigs a on a.doc_id = c.d1
         |join sigs b on b.doc_id = c.d2
         |where bit_count(xor(a.simhash, b.simhash)) <= 6
         |order by hamming, d1, d2""".stripMargin),
    "multimodal: perceptual-hash image near-dup — staged hashes only; banding + skew cap + Hamming verify all hash-verified")

  /** Audio near-dup via spectral fingerprint — completes the modality
    * symmetry (m5 is the image near-dup): PCM decode → Welch PSD → 64-band
    * mean-threshold fingerprint → d2's chunk-banded candidates → Hamming
    * verify. The synthetic corpus plants 24 groups of 5 gain/phase-jittered
    * copies of an 8-tone chord ([[Multimodal.syntheticAudioVariants]]), so
    * the expected pairs are known: jitter cancels in the spectrum (Hamming
    * 0 within a group), distinct chords share ≤2 of 8 bands (Hamming ≥ 12
    * across groups). ONLY the fingerprints (the Welch decode is not
    * DuckDB-reproducible) are staged — the d2 contract: chunk banding,
    * the star-cap skew guard, the candidate self-join AND the Hamming
    * verify are ALL recomputed independently by the oracle from the
    * staged 8-byte rows. At 100 TB: one decode pass (payloads never leave
    * executors), one bounded band shuffle over 8-byte fingerprints —
    * payload bytes are never joined, the m5 contract.
    */
  val audioNearDup = Q(
    "m6_audio_neardup",
    (s, dir) => {
      val sigs = Stage.through(
        Multimodal.audioFingerprints(
          Multimodal.syntheticAudioVariants(s, groups = 24, perGroup = 5)),
        dir, "m6_fps")
      Dedup.hammingPairs(Dedup.simhashCandidatePairs(sigs), sigs)
        .filter(col("hamming") <= 3)
        .orderBy(col("d1"), col("d2"))
    },
    Some(
      s"""with sigs as (
         |  select doc_id, simhash from ${Stage.sqlPath("m6_fps")}
         |), ${candSqlCtes(SimhashBandedSelect, "doc_id")}
         |select c.d1, c.d2,
         |  cast(bit_count(xor(a.simhash, b.simhash)) as int) as hamming
         |from cand c
         |join sigs a on a.doc_id = c.d1
         |join sigs b on b.doc_id = c.d2
         |where bit_count(xor(a.simhash, b.simhash)) <= 3
         |order by d1, d2""".stripMargin),
    "multimodal: spectral-fingerprint audio near-dup — staged fingerprints only; banding + skew cap + Hamming verify all hash-verified")

  /** Video near-dup via per-frame perceptual hashes — completes the
    * image (m5) / audio (m6) / video modality symmetry: m3's frame slicing
    * chained into m5's average-hash gives `(media_id, frame_idx, fhash)`;
    * candidates come from per-frame chunk banding (band key = frame index ×
    * hash chunk, through the same star-capped band join as d2/m5/m6 —
    * clips colliding on ANY frame's chunk become a pair); the verify is
    * CLIP-level: frame-aligned mean Hamming over the sampled frames with
    * a ≥2-aligned-frames evidence floor, so a transcode that damages
    * every frame a little still matches while two clips sharing one
    * coincidental frame chunk do not — even unequal-length clips whose
    * single shared frame index collides exactly. The synthetic
    * corpus plants 24 groups of 5 per-frame-perturbed copies
    * ([[Multimodal.syntheticVideoVariants]]), so expected pairs are known.
    * ONLY the frame hashes (the decode is not DuckDB-reproducible) are
    * staged — the d2 contract: per-frame banding, the star-cap skew
    * guard, the candidate self-join AND the frame-aligned mean-Hamming
    * verify are ALL recomputed independently by the oracle from the
    * staged 12-byte rows. At 100 TB: one decode pass (payloads never
    * leave executors), then every shuffle moves hash rows — frames per
    * clip × 12 bytes, never pixels — the m5/m6 contract extended along
    * the time axis.
    */
  val videoNearDup = Q(
    "m7_video_neardup",
    (s, dir) => {
      val fh = Stage.through(
        Multimodal.videoFrameHashes(
          Multimodal.syntheticVideoVariants(s, groups = 24, perGroup = 5),
          stride = 2),
        dir, "m7_frame_hashes")
      Multimodal.videoNearDupPairs(fh)
        .select(col("d1"), col("d2"), col("n_frames_aligned"),
          graft.Norm.rz(col("avg_hamming"), 4).as("avg_hamming"))
        .filter(col("avg_hamming") <= 6.0)
        .orderBy("d1", "d2")
    },
    Some(
      s"""with fh as (
         |  select media_id, frame_idx, fhash
         |  from ${Stage.sqlPath("m7_frame_hashes")}
         |), ${candSqlCtes(
             "select f.media_id, f.frame_idx * 4 + g.c as band, " +
               "(f.fhash >> (g.c * 16)) & 65535 as bucket " +
               "from fh f cross join range(4) g(c)",
             "media_id")}, j as (
         |  select c.d1, c.d2, a.frame_idx,
         |    bit_count(xor(a.fhash, b.fhash)) as hd
         |  from cand c
         |  join fh a on a.media_id = c.d1
         |  join fh b on b.media_id = c.d2 and b.frame_idx = a.frame_idx
         |)
         |select d1, d2, count(*) as n_frames_aligned,
         |  round(avg(hd), 4) + 0.0 as avg_hamming
         |from j
         |group by d1, d2
         |having round(avg(hd), 4) <= 6.0 and count(*) >= 2
         |order by d1, d2""".stripMargin),
    "multimodal: clip-level video near-dup — staged frame hashes only; banding + skew cap + mean-Hamming verify all hash-verified")
}
