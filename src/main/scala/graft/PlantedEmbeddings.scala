package graft

import org.apache.spark.sql.SparkSession

/** Planted-cluster embeddings fixture generator — the structured
  * counterpart of the uniform-random `embeddings.parquet`, built so the
  * ANN recall audits measure the OPERATOR instead of the random-vector
  * floor (round-15 verdict gap #2: on uniform fixtures neighbors are
  * barely closer than strangers, so PQ has almost no signal to preserve
  * and recall differences between operating points drown in noise).
  *
  * Construction (all deterministic — splitmix64 streams, no RNG state):
  * `clusters` unit-normalized centers with components uniform in [-1, 1)
  * (random directions in R^dim: inter-center L2 ≈ √2); members are
  * center + eps-scaled jitter per component, so intra-cluster L2 is
  * ≈ eps·√(dim/3) ≪ inter-center distance. Cluster of vec_id i is
  * i % clusters — the IvfPqSweep query samples (vec_id < 20 / < 100)
  * then hit distinct clusters. Every vector's exact L2 top-(members-1)
  * is its cluster siblings BY CONSTRUCTION, which is what makes
  * recall@20 meaningful at members = 20.
  *
  * Output: `$outDir/embeddings.parquet` (vec_id LONG, embedding
  * ARRAY<FLOAT>) — the exact shape `Tables.embeddings` loads, so
  * `IvfPqSweep` runs on it unmodified:
  * {{{
  * sbt "runMain graft.PlantedEmbeddings target/planted"
  * SPARK_GRAFT_IVFPQ_OUT=IVFPQAB_PLANTED.json \
  *   sbt "runMain graft.IvfPqSweep target/planted"
  * }}}
  */
object PlantedEmbeddings {

  @inline private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic uniform in [-1, 1). Stream offsets keep center and
    * jitter draws disjoint. */
  @inline private def u(seed: Long): Double =
    splitmix64(seed).toDouble / Long.MaxValue.toDouble

  def vector(id: Long, dim: Int, clusters: Int, eps: Double): Array[Float] = {
    val k = (id % clusters).toInt
    // center: unit-normalized random direction, shared by the cluster
    val c = new Array[Double](dim)
    var n2 = 0.0
    var j = 0
    while (j < dim) {
      c(j) = u(0x10000000L + k.toLong * dim + j)
      n2 += c(j) * c(j)
      j += 1
    }
    val inv = 1.0 / math.sqrt(n2)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) {
      out(j) = (c(j) * inv + eps * u(0x20000000L + id * dim + j)).toFloat
      j += 1
    }
    out
  }

  def write(spark: SparkSession, outDir: String, n: Int = 2000,
      dim: Int = 64, clusters: Int = 100, eps: Double = 0.05): Unit = {
    import spark.implicits._
    spark.range(n)
      .map { id => (id, vector(id, dim, clusters, eps).toSeq) }
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id", "cast(embedding as array<float>) as embedding")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("target/planted")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-planted-embeddings")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    write(spark, outDir)
    System.err.println(s"[planted] wrote $outDir/embeddings.parquet " +
      "(n=2000, dim=64, clusters=100, eps=0.05)")
    spark.stop()
  }
}
