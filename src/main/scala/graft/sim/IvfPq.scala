package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExprs

/** A built IVF-PQ index: `centroids` is the coarse quantizer (cell, cent),
  * `codebooks` the per-subspace PQ codebooks (__j, __code, __flat, __cent),
  * `codes` the encoded corpus WITH its cell assignment
  * (cand_id, cell, __c0..__c{m-1}) — m small ints + a cell id per vector.
  * All three are plain DataFrames; write `codes` partitioned by `cell` and
  * a partial probe prunes whole partitions at the scan while reading only
  * PQ codes, never raw floats — the combined layout 100 TB ANN serving
  * actually uses (coarse pruning × 64× compression). */
case class IvfPqIndex(centroids: DataFrame, codebooks: DataFrame, codes: DataFrame)

/** IVF-PQ — the composite of [[Ivf]] (inverted-file coarse pruning) and
  * [[Pq]] (product-quantized ADC scoring), the standard large-scale ANN
  * index (Jégou et al. 2011 §V, public): the coarse quantizer selects
  * `nprobe` cells per query, and candidates inside those cells are scored
  * from their PQ codes by table lookup — the scan touches nprobe/nlist of
  * the corpus AND reads ~64× fewer bytes per touched vector.
  *
  * This implementation quantizes RAW vectors per cell (flat PQ); classic
  * residual encoding (quantize v − centroid(cell)) is a recall refinement
  * on top of the same plumbing, not a different execution shape.
  *
  * Exactness pin (the [[Ivf]] nprobe = nlist × [[Pq]] grid-recovery tricks
  * COMPOSED): probing every cell makes the coarse quantizer drop out, and
  * a grid corpus makes ADC equal the exact inner product — so the whole
  * composite pipeline (train × 2, encode, cell join, LUT scoring, heap
  * rerank) reproduces brute force bit-for-bit and shares the brute-force
  * SQL oracle (`sim_ivfpq_exact`). */
object IvfPq {

  /** TRAIN + ENCODE: one IVF coarse quantizer, m PQ codebooks, and a
    * single build-time join attaching each vector's cell to its codes
    * (both halves are map-only encodes of the same corpus; the join is
    * paid once at build, never at probe). */
  def buildIndex(corpus: DataFrame, nlist: Int = 16,
                 m: Int = 4, codebookSize: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 trainFraction: Double = 1.0, seed: Long = 42L): IvfPqIndex = {
    val ivf = Ivf.buildIndex(corpus, nlist, idCol, vecCol, seed)
    val pq = Pq.buildIndex(corpus, m, codebookSize, idCol, vecCol,
      trainFraction, seed)
    val codes = pq.codes.join(
      ivf.assigned.select(col("cand_id"), col("cell")), "cand_id")
    IvfPqIndex(ivf.centroids, pq.codebooks, codes)
  }

  /** PROBE: rank cells per query by centroid distance (broadcast
    * constants), keep `nprobe`, join the probed cells against the coded
    * corpus (shuffle bounded by nprobe/nlist of the CODES — thin rows),
    * ADC-score from broadcast LUTs, bounded-heap top-k. The raw corpus
    * never appears. */
  def probeTopK(index: IvfPqIndex, queries: DataFrame, k: Int,
                nprobe: Int = 4,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val geo = Pq.codebookGeometry(index.codebooks)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scoredCells = q.crossJoin(broadcast(index.centroids))
      .withColumn("__dist2",
        VectorExprs.dot(col("qvec"), col("qvec"))
          - lit(2.0) * VectorExprs.dot(col("qvec"), col("cent"))
          + VectorExprs.dot(col("cent"), col("cent")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist2"), col("cell"))
    val probes = scoredCells
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("cell"))
    val lut = Pq.lutFor(queries, index.codebooks, geo, idCol, vecCol)
    val scored = index.codes
      .join(probes.hint("broadcast"), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .join(broadcast(lut), "query_id")
      .withColumn("score", round(Pq.adcExpr(geo), 6))
    Similarity.topKExplode(scored, "score", k)
  }

  /** Self-contained build + probe — the registry-oracle form. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4,
                m: Int = 4, codebookSize: Int = 16,
                idCol: String = "vec_id", vecCol: String = "embedding",
                seed: Long = 42L): DataFrame =
    probeTopK(buildIndex(corpus, nlist, m, codebookSize, idCol, vecCol,
      trainFraction = 1.0, seed), queries, k, nprobe, idCol, vecCol)
}
