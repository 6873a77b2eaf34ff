package graft.serve

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Near-duplicate LOOKUP over a stored [[NearDupService]] layout — the
  * serving face that completes the sixth index family's lifecycle the
  * way [[SearchService]] completes BM25's and [[AnnService]] the vector
  * tiers': a crawler or ingest gate POSTs one document's text and gets
  * back the indexed documents whose estimated Jaccard clears the
  * threshold, seconds after those documents streamed in.
  *
  * Request cost model is the stored probe's: the single probe doc's
  * bucket rows prune the stored bucket scan to ≤ bands matching `bgrp`
  * partitions, candidates fetch their signatures through the same
  * `idgrp` pruning, and the estimate is the signature-agreement
  * fraction — O(probe + matched partitions), never O(index). The
  * layout's banding/group parameters are read per request from its
  * meta (a one-row parquet read), so a concurrent retrain-style
  * parameter change can never be half-applied.
  *
  * The probe document enters under a sentinel id (`Long.MinValue`) so
  * the probe's self-pair exclusion can never silently drop a legitimate
  * corpus id (id 0 is a perfectly valid document). */
final class NearDupLookupService(spark: SparkSession, root: String,
                                 val maxK: Int = 100,
                                 val maxTextLen: Int = 65536) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")

  /** Indexed near-duplicates of `text`: (ref_id, est_jaccard, rank),
    * est ≥ threshold, rank 1..k by (est desc, ref_id). */
  def lookup(text: String, threshold: Double = 0.7,
             k: Int = 10): Seq[(Long, Double, Int)] = {
    require(text != null && text.nonEmpty, "lookup needs non-empty text")
    require(text.length <= maxTextLen,
      s"text over $maxTextLen chars — near-dup lookup is a document " +
        "probe, not a bulk ingest path")
    require(threshold > 0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    import spark.implicits._
    val batch = Seq((Long.MinValue, text)).toDF("doc_id", "text")
    NearDupService.probe(spark, root, batch, "text", "doc_id", threshold)
      .orderBy(col("est_jaccard").desc, col("ref_id"))
      .limit(k)
      .select(col("ref_id"), col("est_jaccard"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (r.getLong(0), r.getDouble(1), i + 1) }
      .toSeq
  }
}
