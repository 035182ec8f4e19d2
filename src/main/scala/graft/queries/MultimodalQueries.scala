package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** Multimodal plumbing over binary payload columns — real decode where a
  * JDK codec exists (ImageIO images, PCM16 WAV, GFV0 frame containers),
  * deterministic stub with a real_decode flag otherwise. mm1 is
  * oracle-checked as plain arithmetic on documents; mm2–mm6 are
  * value-checked against the MediaTruth ground-truth tables (an
  * independent scalar reimplementation written by graft.Verify each run),
  * with the mm5/mm6 pair joins recomputed by DuckDB itself over the truth
  * hashes. The real-codec paths are additionally spec-tested in
  * MultimodalSpec on genuine PNG/WAV/GFV0 bytes. */
object MultimodalQueries extends QueryPack {

  val queries: Map[String, Fn] = Map(
    // Media catalog: typed metadata over binary payloads (oracle on the
    // scalar columns — payload length stands in for the binary).
    "mm1_media_catalog" -> ((s, d) =>
      Multimodal.mediaFromDocuments(Tables.documents(s, d))
        .select(col("media_id"), col("kind"),
          length(col("payload")).as("payload_bytes"),
          col("meta.width").as("width"), col("meta.height").as("height"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy("media_id")),

    // Partition-batched decode + fixed-shape features (STUB decode).
    "mm2_media_features" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .select(col("media_id"), col("kind"),
          size(col("feature")).as("feat_dim"),
          round(aggregate(col("feature"), lit(0.0d),
            (acc, x) => acc + x.cast("double")), 4).as("feat_sum"))
        .orderBy("media_id")),

    // Frame sampling: video → exploded frame rows (real GFV0 container
    // parse when the payload is one; stub stride otherwise, flagged).
    "mm3_video_frames" -> ((s, d) =>
      Multimodal.sampleFrames(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .select(col("media_id"), col("frame_idx"),
          length(col("frame_bytes")).as("frame_len"), col("real_decode"))
        .orderBy("media_id", "frame_idx")),

    // Scene-cut detection: consecutive-frame aHash Hamming per video —
    // shot-boundary segmentation for scene-level sampling. Oracle
    // recomputes the lag/Hamming/threshold machinery in SQL over
    // MediaTruth's independently-computed per-frame hashes.
    "mm7_scene_cuts" -> ((s, d) =>
      Multimodal.sceneCuts(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)),
        maxFrames = 8, cutThreshold = 10)
        .orderBy("media_id", "frame_idx")),

    // Cross-video near-dup by keyframe fingerprints: first frame + every
    // scene-cut frame per video, chunk-bucket Hamming join across
    // videos, one row per near-dup video pair. Oracle recomputes
    // keyframe selection + pairwise Hamming from MediaTruth's per-frame
    // hashes (pairwise is exact at truth scale; the engine's chunk join
    // is the 100 TB path and provably finds the same ≤3-bit pairs).
    "mm8_keyframe_neardup" -> ((s, d) =>
      Multimodal.keyframeNearDups(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)),
        maxFrames = 8, cutThreshold = 10, maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // Perceptual image hashes (aHash/dHash — the image SimHash). Fixture
    // payloads are text stand-ins, so the deterministic stub decode
    // feeds the hash; MultimodalSpec drives real PNGs through it.
    "mm4_perceptual_hash" -> ((s, d) =>
      Multimodal.perceptualHash(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)))
        .orderBy("media_id")),

    // Near-duplicate images via aHash chunk buckets + exact Hamming —
    // duplicate fixture docs surface as hamming-0 payload pairs.
    "mm5_image_neardup" -> ((s, d) =>
      Multimodal.nearDupImages(
        Multimodal.perceptualHash(
          Multimodal.mediaFromDocuments(Tables.documents(s, d))),
        maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // Audio envelope fingerprints + per-clip near-dup degree (the audio
    // analog of mm4/mm5: 64-bit energy-gradient signature, chunk-bucket
    // Hamming join). One row per audio clip so the dump is never empty:
    // fixture audio payloads are text stand-ins whose stub decode rarely
    // pairs (a length change shifts the whole frame grid — the same
    // time-shift limitation a real fixed-grid envelope has), so the
    // PAIR machinery is pinned in MultimodalSpec on real PCM16 WAVs
    // (gain-variant duplicate found, different envelope not).
    "mm6_audio_fingerprint" -> ((s, d) => {
      val fp = Multimodal.audioFingerprint(
        Multimodal.mediaFromDocuments(Tables.documents(s, d))
          .filter(col("kind") === "audio"))
      val pairs = Multimodal.nearDupByHash(fp, "afp", maxHamming = 3)
      val deg = pairs.select(col("id_a").as("media_id"))
        .unionAll(pairs.select(col("id_b").as("media_id")))
        .groupBy("media_id").agg(count(lit(1)).as("n_neardups"))
      fp.join(deg, Seq("media_id"), "left")
        .select(col("media_id"), col("real_decode"), col("afp"),
          coalesce(col("n_neardups"), lit(0L)).as("n_neardups"))
        .orderBy("media_id")
    })
  )

  // mm2–mm6 oracles read the MediaTruth ground-truth parquet (an
  // INDEPENDENT driver-side reimplementation of the deterministic media
  // math, regenerated by graft.Verify each run from the same fixture
  // bytes) — and for the pair queries (mm5/mm6) DuckDB recomputes the
  // Hamming-join itself with bit_count/xor over the truth hashes, so the
  // bucketed pair machinery is value-checked, not just the hashes.
  private val truth = graft.ops.MediaTruth.defaultDir

  val oracle: Map[String, String] = Map(
    "mm1_media_catalog" ->
      """SELECT doc_id AS media_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
           CAST(n_chars % 64 + 32 AS INT) AS width,
           CAST(n_chars % 48 + 24 AS INT) AS height,
           CAST(n_chars * 10 AS INT) AS duration_ms
         FROM documents ORDER BY media_id""",
    "mm2_media_features" ->
      s"""SELECT media_id, kind, feat_dim, feat_sum
          FROM read_parquet('$truth/mm2.parquet/*.parquet')
          ORDER BY media_id""",
    "mm3_video_frames" ->
      s"""SELECT media_id, frame_idx, frame_len, real_decode
          FROM read_parquet('$truth/mm3.parquet/*.parquet')
          ORDER BY media_id, frame_idx""",
    "mm4_perceptual_hash" ->
      s"""SELECT media_id, kind, real_decode, ahash, dhash
          FROM read_parquet('$truth/mm4.parquet/*.parquet')
          ORDER BY media_id""",
    "mm7_scene_cuts" ->
      s"""WITH f AS (SELECT media_id, frame_idx, ahash
            FROM read_parquet('$truth/mm7.parquet/*.parquet')),
          l AS (SELECT media_id, frame_idx, ahash,
            lag(ahash) OVER (PARTITION BY media_id ORDER BY frame_idx)
              AS prev FROM f)
          SELECT media_id, frame_idx,
            CAST(bit_count(xor(ahash, prev)) AS INT) AS hamming,
            bit_count(xor(ahash, prev)) >= 10 AS is_cut
          FROM l WHERE prev IS NOT NULL
          ORDER BY media_id, frame_idx""",
    "mm8_keyframe_neardup" ->
      s"""WITH f AS (SELECT media_id, frame_idx, ahash
            FROM read_parquet('$truth/mm7.parquet/*.parquet')),
          l AS (SELECT media_id, frame_idx, ahash,
            lag(ahash) OVER (PARTITION BY media_id ORDER BY frame_idx)
              AS prev FROM f),
          kf AS (SELECT media_id, frame_idx, ahash FROM l
            WHERE prev IS NULL OR bit_count(xor(ahash, prev)) >= 10),
          p AS (SELECT a.media_id AS id_a, b.media_id AS id_b,
            CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
           FROM kf a JOIN kf b ON a.media_id < b.media_id)
          SELECT id_a, id_b,
            CAST(count(*) AS BIGINT) AS n_shared_keyframes,
            CAST(min(hamming) AS BIGINT) AS min_hamming
          FROM p WHERE hamming <= 3
          GROUP BY id_a, id_b ORDER BY id_a, id_b""",
    "mm5_image_neardup" ->
      s"""WITH t AS (SELECT media_id, ahash
                     FROM read_parquet('$truth/mm4.parquet/*.parquet'))
          SELECT a.media_id AS id_a, b.media_id AS id_b,
            CAST(bit_count(xor(a.ahash, b.ahash)) AS INT) AS hamming
          FROM t a, t b
          WHERE a.media_id < b.media_id
            AND bit_count(xor(a.ahash, b.ahash)) <= 3
          ORDER BY id_a, id_b""",
    "mm6_audio_fingerprint" ->
      s"""WITH fp AS (SELECT media_id, real_decode, afp
                      FROM read_parquet('$truth/mm6.parquet/*.parquet')),
           pairs AS (SELECT a.media_id AS id_a, b.media_id AS id_b
                     FROM fp a, fp b
                     WHERE a.media_id < b.media_id
                       AND bit_count(xor(a.afp, b.afp)) <= 3),
           deg AS (SELECT media_id, count(*) AS n FROM (
                     SELECT id_a AS media_id FROM pairs
                     UNION ALL SELECT id_b FROM pairs)
                   GROUP BY media_id)
          SELECT fp.media_id, fp.real_decode, fp.afp,
            COALESCE(deg.n, CAST(0 AS BIGINT)) AS n_neardups
          FROM fp LEFT JOIN deg USING (media_id)
          ORDER BY fp.media_id"""
  )
}
