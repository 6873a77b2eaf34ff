package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.text.TextOps

/** Request-time DSIR scoring over a STORED per-bucket weight layout
  * (`root/weights`, the [[graft.text.TextOps.dsirBucketWeights]] frame)
  * — the build-once / probe-cheap tier of the DSIR family. The headline
  * faces retrain the importance weights from the full corpus per
  * invocation (2.8–4.8 s warm each at sf0.1); the weights are a trained
  * artifact exactly like BM25 stats or the ANN codebooks, so this tier
  * trains them once (nightly, or on demand) and scores any incoming
  * batch with a batch-sized feature map + a ≤ `buckets`-row broadcast
  * join. `scoreStats` is integer-exact — scoring the training corpus
  * replays `dsirStats` bit-for-bit, which is what makes the stored
  * probe face hash-green; `scoreWeights` serves the ln-weight analytic
  * over the stored round-6 log-ratios.
  *
  * Reference anchor: the reference pipeline has no trained-selection
  * analog (its dag retrains nothing); this tier exists for the
  * 100 TB training-data path, where re-deriving corpus marginals per
  * scoring batch is the difference between O(batch) and O(corpus). */
final class DsirService(weights: DataFrame, val buckets: Int) {
  require(buckets > 1 && buckets <= 65536,
    s"buckets must be in [2, 65536], got $buckets")

  /** Integer-exact sufficient statistics + linearized margin for a
    * document batch ([[graft.text.TextOps.dsirScoreAgainst]]):
    * (doc_id, n_feats, s_tgt, s_raw, margin). */
  def scoreStats(docs: DataFrame, textCol: String,
                 idCol: String): DataFrame =
    TextOps.dsirScoreAgainst(docs, textCol, idCol, weights, buckets)

  /** ln importance weights for a document batch over the stored
    * round-6 log-ratios: (doc_id, n_feats, logw). */
  def scoreWeights(docs: DataFrame, textCol: String,
                   idCol: String): DataFrame =
    TextOps.dsirScoreWeightsAgainst(docs, textCol, idCol, weights, buckets)
}

object DsirService {

  /** Train the per-bucket weight frame from `raw` + `target` and store
    * it at `root/weights` — ONE corpus + target scan, ≤ `buckets` rows
    * out. */
  def buildWeights(raw: DataFrame, target: DataFrame, textCol: String,
                   idCol: String, root: String, buckets: Int = 1024,
                   numFiles: Int = 1): Unit =
    TextOps.dsirBucketWeights(raw, target, textCol, idCol, buckets)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/weights")

  /** Open a stored weight layout for serving (crashed swaps healed
    * first — the family contract). `buckets` is recovered from the
    * stored frame itself: the spine is dense, one row per bucket. */
  def overParquetDir(spark: SparkSession, root: String): DsirService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/weights")
    val w = spark.read.parquet(s"$root/weights")
    new DsirService(w, w.count().toInt)
  }

  /** Build the FULL streamed-ingest layout at `root` — the lifecycle
    * form [[graft.streaming.StreamOps.dsirIngestStream]] appends into:
    *   - `root/target`  (b, ct) target marginal, written once (the
    *     curated target set is the trained constant of the family);
    *   - `root/raw`     (b, cr) raw marginal — ONE base frame here,
    *     plus one delta file-set per streamed micro-batch (readers SUM
    *     by bucket);
    *   - `root/weights` the derived serving frame
    *     ([[overParquetDir]] reads only this).
    * Bucket counts are additive, so [[recomputeWeights]] re-derives the
    * weight table from the summed marginals in O(buckets) — no corpus
    * rescan, which is what makes live DSIR ingest viable at corpus
    * scale. `raw` may be EMPTY (bootstrap everything through the
    * stream). */
  def buildLayout(raw: DataFrame, target: DataFrame, textCol: String,
                  idCol: String, root: String, buckets: Int = 1024,
                  numFiles: Int = 1): Unit = {
    val spark = raw.sparkSession
    TextOps.dsirBatchMarginal(target, textCol, idCol, buckets)
      .withColumnRenamed("cr", "ct")
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/target")
    TextOps.dsirBatchMarginal(raw, textCol, idCol, buckets)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/raw")
    TextOps.dsirWeightsFromMarginals(spark,
        spark.read.parquet(s"$root/raw"),
        spark.read.parquet(s"$root/target"), buckets)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/weights")
  }

  /** The layout's bucket count — the weight frame IS the dense spine,
    * one row per bucket. */
  def bucketsOf(spark: SparkSession, root: String): Int =
    spark.read.parquet(s"$root/weights").count().toInt

  /** FOLD streamed marginal deltas into a fresh weight table — the
    * O(buckets) nightly of the streamed layout: sum `root/raw` (base +
    * every committed delta) and `root/target` by bucket, re-derive, and
    * marker-fenced-swap `root/weights`. Costs bucket arithmetic, not a
    * corpus rescan; stream-folded weights are bit-identical to a full
    * retrain on the same corpus ([[graft.text.TextOps
    * .dsirWeightsFromMarginals]] — the StreamOpsSpec pin). */
  def recomputeWeights(spark: SparkSession, root: String,
                       numFiles: Int = 1): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/weights")
    val buckets = bucketsOf(spark, root)
    val tmp = s"$root/weights-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    TextOps.dsirWeightsFromMarginals(spark,
        spark.read.parquet(s"$root/raw"),
        spark.read.parquet(s"$root/target"), buckets)
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/weights", tmp)
  }

  /** REFRESH the weights: full retrain + marker-fenced swap — the
    * marginals are global (one new document shifts every bucket's raw
    * count), so like graph ranks the refresh unit is the rebuild. */
  def refreshWeights(spark: SparkSession, root: String, raw: DataFrame,
                     target: DataFrame, textCol: String, idCol: String,
                     buckets: Int = 1024, numFiles: Int = 1): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/weights")
    val tmp = s"$root/weights-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    TextOps.dsirBucketWeights(raw, target, textCol, idCol, buckets)
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/weights", tmp)
  }
}
