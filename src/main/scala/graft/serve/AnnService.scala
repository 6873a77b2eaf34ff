package graft.serve

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sim.{Ivf, IvfIndex, IvfPq, IvfPqIndex}

/** Common contract every ANN serving backend exposes to
  * [[HttpQueryServer]]'s `/ann` route: a fixed index dimension, a request
  * cap, and a bounded top-k probe. Implementations differ only in the
  * stored layout they open and the score they rank by. */
trait AnnBackend {
  /** Vector dimension the stored index was built at. */
  def dim: Int
  /** Hard per-request cap on k (the HTTP layer clamps before calling). */
  def maxK: Int
  /** Top-k ids for the query vector: (cand_id, score, rank), rank 1..k. */
  def topK(vec: Seq[Float], k: Int): Seq[(Long, Double, Int)]
}

/** ANN serving surface over a STORED IVF index — the similarity-search
  * analog of [[QueryService]]: the cell-partitioned index is read once
  * from parquet (no retraining, no corpus rescan), each request carries a
  * raw query vector and pays only the `nprobe`-cell probe.
  *
  * Request safety mirrors the table endpoint's philosophy: the vector
  * must match the index dimension exactly, `k` is capped at `maxK`, and
  * the per-request `collect()` is bounded at k rows by construction.
  * Nothing from the request ever reaches SQL text — the vector enters the
  * plan as a typed literal column. */
final class AnnService(index: IvfIndex, val dim: Int, val maxK: Int = 100,
                       nprobe: Int = 4) extends AnnBackend {
  require(dim > 0, s"dim must be > 0, got $dim")
  require(maxK > 0, s"maxK must be > 0, got $maxK")
  require(nprobe > 0, s"nprobe must be > 0, got $nprobe")

  /** Top-k ids for the query vector: (cand_id, cosine, rank), rank 1..k.
    * k above `maxK` is an error (the HTTP layer caps before calling). */
  def topK(vec: Seq[Float], k: Int): Seq[(Long, Double, Int)] = {
    require(vec.length == dim,
      s"query vector has ${vec.length} dims; the index carries $dim")
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val spark = index.centroids.sparkSession
    import spark.implicits._
    val q = Seq((-1L, vec.toArray)).toDF("vec_id", "embedding")
    Ivf.probeTopK(index, q, k, nprobe)
      .orderBy(col("rank"))
      .select(col("cand_id"), col("cosine"), col("rank"))
      .as[(Long, Double, Int)].collect().toSeq
  }
}

object AnnService {
  /** Open a stored index layout (`root/centroids`, `root/assigned` — the
    * frames [[Ivf.buildIndex]] writes) and probe the dimension from one
    * centroid row (sanctioned single-row collect). */
  def overParquetDir(spark: SparkSession, root: String, maxK: Int = 100,
                     nprobe: Int = 4): AnnService = {
    val centroids = spark.read.parquet(s"$root/centroids")
    val assigned = spark.read.parquet(s"$root/assigned")
    val dim = centroids.select(size(col("cent")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    new AnnService(IvfIndex(centroids, assigned), dim, maxK, nprobe)
  }
}

/** ANN serving over a STORED residual IVF-PQ index (IVFADC — the layout
  * [[IvfPq.buildResidualIndex]] writes): centroids + per-subspace
  * codebooks + the cell-partitioned CODE frame are opened once, and each
  * request pays only [[IvfPq.probeResidualTopK]] — nprobe cells of thin
  * PQ codes scanned, scored `q·centroid + ADC` from broadcast LUTs,
  * bounded-heap top-k. The raw corpus never participates: this is the
  * actual 100 TB serving format (coarse pruning × ~64× compression),
  * where [[AnnService]] still reads full-width vectors inside probed
  * cells.
  *
  * Same request-safety contract as the flat service: dimension checked
  * against the stored codebook geometry, k capped at `maxK`, per-request
  * collect bounded at k rows, the vector entering the plan only as a
  * typed literal. */
final class AnnPqService(index: IvfPqIndex, val dim: Int, val maxK: Int = 100,
                         nprobe: Int = 4) extends AnnBackend {
  require(dim > 0, s"dim must be > 0, got $dim")
  require(maxK > 0, s"maxK must be > 0, got $maxK")
  require(nprobe > 0, s"nprobe must be > 0, got $nprobe")

  /** Top-k ids for the query vector: (cand_id, score, rank), rank 1..k,
    * score = q·centroid(cell) + ADC(q, r̂) — inner product against the
    * reconstructed vector. */
  def topK(vec: Seq[Float], k: Int): Seq[(Long, Double, Int)] = {
    require(vec.length == dim,
      s"query vector has ${vec.length} dims; the index carries $dim")
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val spark = index.centroids.sparkSession
    import spark.implicits._
    val q = Seq((-1L, vec.toArray)).toDF("vec_id", "embedding")
    IvfPq.probeResidualTopK(index, q, k, nprobe)
      .orderBy(col("rank"))
      .select(col("cand_id"), col("score"), col("rank"))
      .as[(Long, Double, Int)].collect().toSeq
  }
}

object AnnPqService {
  /** Open a stored residual IVF-PQ layout (`root/centroids`,
    * `root/codebooks`, `root/codes` — `codes` partitioned by `cell` so a
    * partial probe prunes whole partitions at the scan). The dimension
    * comes from the coarse centroids (sanctioned single-row collect), the
    * same frame the probe broadcasts on every request. */
  def overParquetDir(spark: SparkSession, root: String, maxK: Int = 100,
                     nprobe: Int = 4): AnnPqService = {
    val centroids = spark.read.parquet(s"$root/centroids")
    val codebooks = spark.read.parquet(s"$root/codebooks")
    val codes = spark.read.parquet(s"$root/codes")
    val dim = centroids.select(size(col("cent")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    new AnnPqService(IvfPqIndex(centroids, codebooks, codes), dim, maxK, nprobe)
  }
}
