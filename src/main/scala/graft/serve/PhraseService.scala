package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Request-time exact-phrase search over a STORED positional index —
  * the serving face of [[graft.text.TextOps.phraseSearchTopK]], sitting
  * beside the BM25 [[SearchService]]: BM25 answers "which documents are
  * ABOUT these words", this answers "which documents contain this exact
  * (or near-exact) word sequence", the other half of a production
  * keyword stack.
  *
  * Layout: one row per token occurrence (term, doc_id, pos), written
  * partitioned by the BM25 family's 64-way term bucket
  * ([[graft.text.TextOps.bm25Bucket]] — an ON-DISK FORMAT INVARIANT
  * shared with the BM25 layout). A probe recomputes its terms' buckets
  * from the query alone and prunes the scan to them — only the phrase's
  * terms are ever read, the 100 TB access pattern (plan-pinned in
  * PhraseSpec).
  *
  * Maintenance: the layout is mechanically a bucket-partitioned postings
  * frame, so the BM25 layout's ops apply unchanged —
  * [[graft.io.Sinks.compactLayoutInPlace]] for small files (wrapped
  * here), partition-scoped rewrites for takedown/upsert. Request-safety
  * envelope as the other services: bounded k, bounded phrase length,
  * argument errors are loud [[IllegalArgumentException]]s the HTTP layer
  * maps to 400. */
final class PhraseSearchService(postings: DataFrame, val maxK: Int = 100,
                                maxTerms: Int = 8) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")
  require(maxTerms > 0, s"maxTerms must be > 0, got $maxTerms")

  /** Top-k documents by exact-phrase occurrence count:
    * (doc_id, n_hits, rank), rank 1..k, ties by doc_id. */
  def topK(phrase: Seq[String], k: Int): Seq[(Long, Long, Int)] = {
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    require(phrase.size <= maxTerms,
      s"phrase carries ${phrase.size} terms; the service caps at $maxTerms")
    // normalize ONCE, before bucketing: the stored postings are
    // lowercase (positionalPostings tokenizes lower(text)) and
    // phraseMatches trims + lowercases its terms — bucketing the RAW
    // term would prune a mixed-case phrase to the WRONG partitions and
    // silently return empty/partial results (the SearchService
    // precedent: bm25Bucket over the lowercased term)
    val terms = phrase.map(_.trim.toLowerCase(java.util.Locale.ROOT))
    val pruned = postings
      .filter(terms.map(tm => col("bucket") === TextOps.bm25Bucket(lit(tm)))
        .reduce(_ || _))
      .drop("bucket")
    val spark = postings.sparkSession
    import spark.implicits._
    TextOps.phraseSearchTopK(pruned, terms, k)
      .orderBy(col("rank"))
      .as[(Long, Long, Int)].collect().toSeq
  }
}

object PhraseSearchService {

  /** Build the stored positional layout: tokenize once, bucket by term,
    * one file per bucket ([[graft.io.Sinks.onePerPartitionValue]] — a
    * fresh build must not need immediate compaction). */
  def buildIndex(docs: DataFrame, textCol: String, idCol: String,
                 root: String): Unit = {
    val post = TextOps.positionalPostings(docs, textCol, idCol)
      .withColumn("bucket", TextOps.bm25Bucket(col("term")))
    graft.io.Sinks.onePerPartitionValue(post, Seq("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$root/postings")
  }

  /** Open a stored positional layout for serving. */
  def overParquetDir(spark: SparkSession, root: String, maxK: Int = 100,
                     maxTerms: Int = 8): PhraseSearchService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/postings")
    new PhraseSearchService(
      spark.read.parquet(s"$root/postings"), maxK, maxTerms)
  }

  /** Index-aware compaction — bucket partitioning (probe pruning) kept,
    * uncommitted-batch orphans scrubbed first, `_ledger` survives (the
    * [[SearchService.compactIndex]] contract on the same layout shape). */
  def compactIndex(spark: SparkSession, root: String,
                   filesPerPartition: Int = 1): Unit = {
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/postings"))
    graft.io.Sinks.compactLayoutInPlace(spark, s"$root/postings",
      Seq("bucket"), filesPerPartition)
  }
}
