package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.sources.Tables

/** Multimodal plumbing over binary payload columns — real decode where a
  * JDK codec exists (ImageIO images, PCM16 WAV, GFV0 frame containers),
  * deterministic stub with a real_decode flag otherwise. Rows-only checks: binary/array outputs aren't oracle
  * material, the schema/partitioning/batching contract is spec-tested in
  * MultimodalSpec. The metadata projection (mm1) IS oracle-checked since
  * it's plain arithmetic on documents. */
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

  val oracle: Map[String, String] = Map(
    "mm1_media_catalog" ->
      """SELECT doc_id AS media_id,
           ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS kind,
           CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
           CAST(n_chars % 64 + 32 AS INT) AS width,
           CAST(n_chars % 48 + 24 AS INT) AS height,
           CAST(n_chars * 10 AS INT) AS duration_ms
         FROM documents ORDER BY media_id"""
    // mm2/mm3: stub decode outputs — spec-tested, rows-only here.
  )
}
