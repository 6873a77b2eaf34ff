package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Keyword-search serving over a STORED BM25 inverted index — the text
  * retrieval member of the serving tier ([[QueryService]] serves tables,
  * [[AnnService]]/[[AnnPqService]] serve vectors, this serves keyword
  * queries): the bucket-partitioned postings frame and the one-row corpus
  * stats are opened once; each request pays only the query terms'
  * partitions (constant-folded bucket literals → partition pruning at the
  * scan) plus the [[TextOps.bm25TopK]] aggregation.
  *
  * Request safety mirrors the other services: term count and k are
  * capped, terms reach the plan ONLY as typed `isin`/bucket literals
  * (never SQL text), and the per-request collect is bounded at k rows. */
final class SearchService(postings: DataFrame, stats: DataFrame,
                          val maxK: Int = 100, val maxTerms: Int = 16) {
  require(maxK > 0, s"maxK must be > 0, got $maxK")
  require(maxTerms > 0, s"maxTerms must be > 0, got $maxTerms")

  private val bucketed = postings.columns.contains("bucket")

  /** Top-k docs for the query terms: (doc_id, score, rank), rank 1..k. */
  def topK(terms: Seq[String], k: Int): Seq[(Long, Double, Int)] = {
    require(terms.nonEmpty, "search needs at least one term")
    require(terms.size <= maxTerms,
      s"at most $maxTerms terms per request, got ${terms.size}")
    require(k > 0 && k <= maxK, s"k must be in [1, $maxK], got $k")
    val p =
      if (bucketed)
        postings.filter(terms.map(tm =>
            col("bucket") === TextOps.bm25Bucket(lit(tm.toLowerCase)))
          .reduce(_ || _)).drop("bucket")
      else postings
    val spark = postings.sparkSession
    import spark.implicits._
    TextOps.bm25TopK(p, stats, terms, k)
      .orderBy(col("rank"))
      .as[(Long, Double, Int)].collect().toSeq
  }
}

object SearchService {
  /** Open a stored inverted-index layout (`root/postings` — written
    * partitioned by [[TextOps.bm25Bucket]] — and `root/stats`). */
  def overParquetDir(spark: SparkSession, root: String, maxK: Int = 100,
                     maxTerms: Int = 16): SearchService =
    new SearchService(spark.read.parquet(s"$root/postings"),
      spark.read.parquet(s"$root/stats"), maxK, maxTerms)
}
