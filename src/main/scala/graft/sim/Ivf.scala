package graft.sim

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorExprs

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to [[Similarity.lshTopK]], trading a small training step for
  * much better candidate selectivity on clustered embeddings:
  *
  *   1. coarse quantizer: k-means over the corpus (MLlib, seeded) → `nlist`
  *      centroid cells;
  *   2. corpus assignment: map-only `model.transform`, one cell id per
  *      vector — at 100 TB this is the partition key of the ANN index;
  *   3. query probing: each query scores the `nlist` centroids (driver-side
  *      constants, broadcast literal frame) and keeps the `nprobe` nearest
  *      cells;
  *   4. candidates = corpus ⋈ probes on cell id (shuffle on cell — bounded
  *      by nprobe/nlist of the corpus), exact cosine rerank keeps top-k.
  *
  * `nprobe = nlist` degenerates to exact brute force (every cell probed) —
  * the property the recall test pins. */
object Ivf {

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession

    val fv = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("cvec"))
      .withColumn("__fv", array_to_vector(col("cvec")))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("__fv").setPredictionCol("__cell")
      .fit(fv.select("__fv"))
    val assigned = model.transform(fv).select(
      col("cand_id"), col("cvec"), col("__cell"),
      VectorExprs.norm(col("cvec")).as("cn"))

    // Centroids are tiny driver-side constants → literal frame, broadcast.
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }.toSeq
      .toDF("__cell", "__cent")

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qn", VectorExprs.norm(col("qvec")))
    // L2 distance² to each centroid: |q|² − 2q·c + |c|² (norm terms via the
    // codegen'd dot). Rank per query, probe the nprobe nearest cells.
    val scoredCells = q.crossJoin(broadcast(centroids))
      .withColumn("__dist2",
        VectorExprs.dot(col("qvec"), col("qvec"))
          - lit(2.0) * VectorExprs.dot(col("qvec"), col("__cent"))
          + VectorExprs.dot(col("__cent"), col("__cent")))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("__dist2"), col("__cell"))
    val probes = scoredCells
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qvec"), col("qn"), col("__cell"))

    val cand = assigned.join(probes, Seq("__cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", round(
        when(col("qn") > 0 && col("cn") > 0,
          VectorExprs.dot(col("qvec"), col("cvec")) / (col("qn") * col("cn")))
          .otherwise(lit(0.0)), 6))
    // exact rerank via the bounded-heap topk_desc aggregate: partial
    // map-side heaps cap the rerank shuffle at k rows per query per
    // partition; (cosine desc, cand_id) tie-break matches the window form
    cand.groupBy(col("query_id"))
      .agg(call_function("topk_desc", col("cosine"), col("cand_id"), lit(k)).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("query_id"), col("e.id").as("cand_id"), col("e.score").as("cosine"),
        (col("pos") + 1).cast(IntegerType).as("rank"))
  }
}
