package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash-LSH
  * near-dup, SimHash, and char-n-gram Jaccard.
  *
  * Scale design: every variant is join/aggregate based — no driver-side
  * state, no O(n²) cross join. MinHash-LSH shuffles once on band keys
  * (candidates only), which is the 100 TB path: n² pair comparison is
  * replaced by banding so only probable-duplicate pairs are ever
  * materialized. All hashes are deterministic (xxhash64 + fixed affine
  * constants) so signatures agree across executors and runs.
  */
object Dedup {

  // ---- exact -------------------------------------------------------------

  /** Exact dedup with a deterministic canonical representative: keep the
    * row whose id is the minimum within its text group. Equivalent to
    * dropDuplicates but with an explicit, auditable keep-rule (needed when
    * 100 TB pipelines must explain *which* copy survived). */
  def exactDedupKeep(df: DataFrame, text: Column, id: Column): DataFrame =
    df.withColumn("canonical_id", min(id).over(Window.partitionBy(text)))
      .withColumn("is_kept", id === col("canonical_id"))

  // ---- MinHash-LSH -------------------------------------------------------

  /** Word n-gram shingles over a token array (at least one shingle even for
    * short docs). */
  def wordShingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** MinHash signature: hash family i is xxhash64 seeded by mixing the
    * family index into the hashed tuple — overflow-free under ANSI mode
    * (wraparound affine transforms would throw), deterministic across
    * executors, and fully codegen'd. */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingles, s =>
        xxhash64(lit(i), s).bitwiseAND(lit(Long.MaxValue))))
    }: _*)

  /** Band keys for LSH: murmur3 over each r-row slice of the signature. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      hash(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Candidate pairs from banding: docs sharing any band key. Input must
    * have columns (id, bkeys). Output (id_a, id_b), id_a < id_b, distinct.
    * The self-join shuffles on (band, key) — candidates only, never n². */
  def lshCandidatePairs(df: DataFrame, id: String, bkeys: String): DataFrame = {
    val exploded = df.select(col(id), posexplode(col(bkeys)).as(Seq("band", "key")))
    exploded.alias("a")
      .join(exploded.alias("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
        col(s"a.$id") < col(s"b.$id"))
      .select(col(s"a.$id").as("id_a"), col(s"b.$id").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard similarity of two (distinct-element) arrays. Integer
    * size arithmetic + one double division — cross-engine exact. The
    * intersection is bound to a lambda variable so it is computed once. */
  def jaccard(a: Column, b: Column): Column =
    element_at(
      transform(array(size(array_intersect(a, b))), inter =>
        inter.cast("double") / (size(a) + size(b) - inter).cast("double")),
      1)

  /** Full MinHash-LSH near-dup pipeline over (id, text): signature → bands
    * → candidate pairs → exact-Jaccard verification at `threshold`. */
  def minhashNearDupPairs(
      docs: DataFrame, id: Column, text: Column,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.6): DataFrame = {
    val r = numHashes / bands
    // Materialized once: the signature+shingle computation feeds both the
    // band join and the verification join; without persist the whole
    // hash pipeline would be recomputed for each of the three scans.
    val prepared = docs.select(
      id.as("mh_id"),
      array_distinct(wordShingles(TextAnalysis.tokens(text), shingleN))
        .as("shingles"))
      .withColumn("sig", minhashSignature(col("shingles"), numHashes))
      .withColumn("bkeys", bandKeys(col("sig"), bands, r))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = lshCandidatePairs(
      prepared.select(col("mh_id"), col("bkeys")), "mh_id", "bkeys")
    val sets = prepared.select(col("mh_id"), col("shingles"))
    pairs
      .join(sets.withColumnRenamed("mh_id", "id_a")
        .withColumnRenamed("shingles", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("mh_id", "id_b")
        .withColumnRenamed("shingles", "sh_b"), "id_b")
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---- SimHash -----------------------------------------------------------

  private val Pow2: Column = array((0 until 64).map(k => lit(1L << k)): _*)

  /** 64-bit SimHash over a token array: per-bit ±1 votes from each token's
    * xxhash64, sign of the vote sum becomes the bit. Near-dup docs land at
    * small Hamming distance; bucketing by 16-bit chunks gives the LSH-style
    * candidate join (a pair within Hamming ≤ 3 of a 4-chunk split must
    * share at least one exact chunk). */
  def simhash64(toks: Column): Column = {
    val votes = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc,
          transform(sequence(lit(0), lit(63)),
            i => when(h.bitwiseAND(element_at(Pow2, i + 1)) =!= 0, 1)
              .otherwise(-1)),
          (x, y) => x + y)
      })
    aggregate(
      sequence(lit(0), lit(63)).as("idx"),
      lit(0L),
      (acc, i) => acc +
        when(element_at(votes, i + 1) > 0, element_at(Pow2, i + 1))
          .otherwise(0L))
  }

  /** The four 16-bit chunks of a simhash (candidate-bucket keys). */
  def simhashChunks(sim: Column): Column =
    array((0 until 4).map(c =>
      shiftright(sim, c * 16).bitwiseAND(lit(0xffffL))): _*)

  // ---- char n-gram Jaccard ----------------------------------------------

  /** Distinct character n-grams of the lowercased text. */
  def charNgrams(text: Column, n: Int): Column = {
    val lowered = lower(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(lowered) - lit(n - 1), lit(1))),
        i => lowered.substr(i, lit(n))))
  }

  /** N-gram Jaccard near-dup pairs inside blocking buckets (same `block`
    * value), exact pairwise within a bucket. Demonstration-scale blocking;
    * the 100 TB path is minhashNearDupPairs. */
  def ngramJaccardPairs(
      docs: DataFrame, id: Column, text: Column, block: Column,
      n: Int = 3, threshold: Double = 0.6): DataFrame = {
    val t = docs.select(id.as("ng_id"), block.as("blk"),
      charNgrams(text, n).as("grams"))
    t.alias("a")
      .join(t.alias("b"),
        col("a.blk") === col("b.blk") && col("a.ng_id") < col("b.ng_id"))
      .withColumn("jaccard", jaccard(col("a.grams"), col("b.grams")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.ng_id").as("id_a"), col("b.ng_id").as("id_b"),
        col("jaccard"))
  }
}
