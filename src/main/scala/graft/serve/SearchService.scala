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
      readStats(spark, root), maxK, maxTerms)

  /** The one-row effective corpus stats of a stored layout. The stats
    * directory is append-friendly: [[buildIndex]] writes one row and each
    * streamed micro-batch ([[graft.streaming.StreamOps.bm25IngestStream]])
    * adds its own one-row DELTA file (per-batch deltas are what make the
    * replay-safe commit possible — an in-place read-modify-write could
    * double-count on replay), so the effective (n_docs, dl_sum) is the
    * SUM over all stored rows. Constant-size aggregate — one row per
    * build/refresh/batch. */
  def readStats(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/stats")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("dl_sum")).as("dl_sum"))

  /** Full rebuild of the stored layout: postings partitioned by the
    * 64-way term bucket + the one-row corpus stats. The input is spread
    * before the tokenize+explode (single-row-group files would otherwise
    * run the whole map side on one task). */
  def buildIndex(df: DataFrame, textCol: String, idCol: String,
                 root: String): Unit = {
    val spread = graft.util.Spread.forMapWork(df)
    graft.io.Sinks.onePerPartitionValue(
        TextOps.bm25Postings(spread, textCol, idCol)
          .withColumn("bucket", TextOps.bm25Bucket(col("term"))),
        Seq("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/postings")
    TextOps.bm25CorpusStats(spread, textCol)
      .write.mode("overwrite").parquet(s"$root/stats")
  }

  /** Index-aware compaction of a stored BM25 layout — the maintenance op
    * that keeps months of [[appendDelta]] refreshes and
    * [[graft.streaming.StreamOps.bm25IngestStream]] micro-batches from
    * degrading probe latency: the bucket-partitioned postings are
    * rewritten to `filesPerPartition` files per term bucket WITH the
    * `bucket=` partitioning (and thus probe-time pruning) preserved
    * ([[graft.io.Sinks.compactLayoutInPlace]]'s versioned-dir swap), and
    * the per-batch stats delta rows fold into one canonical row. The
    * `_ledger` markers live outside both dataset dirs and survive, so a
    * replayed pre-compaction batch is still recognized and skipped. */
  def compactIndex(spark: SparkSession, root: String,
                   filesPerPartition: Int = 1): Unit = {
    // an UNCOMMITTED streamed batch's partial files must not be folded
    // into the untagged rewrite — its replay would re-add every row
    // (the stream redoes it from checkpointed source offsets anyway)
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/postings", s"$root/stats"))
    graft.io.Sinks.compactLayoutInPlace(spark, s"$root/postings",
      Seq("bucket"), filesPerPartition)
    import spark.implicits._
    def lng(r: org.apache.spark.sql.Row, c: String): Long =
      if (r.isNullAt(r.fieldIndex(c))) 0L else r.getAs[Long](c)
    val one = readStats(spark, root).collect()(0) // one-row collect
    Seq((lng(one, "n_docs"), lng(one, "dl_sum"))).toDF("n_docs", "dl_sum")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/stats")
  }

  /** O(delta + touched buckets) incremental ingest into a stored layout —
    * the steady-state refresh the serving tier lives on (the MinHash
    * family's `incrementalNearDups` analog for keyword search): delta
    * postings APPEND as new files into only the term buckets the delta
    * corpus touches (dynamic partitionBy — base files are never
    * rewritten, never read), and the one-row corpus stats are replaced by
    * their sum with the delta's. Merged ≡ rebuilt is hash-certified by
    * the `txt_bm25_merge` registry face; SearchIndexSpec additionally
    * pins that no pre-existing postings file is rewritten.
    *
    * PRECONDITION (from [[TextOps.bm25MergeIndex]]): delta doc_ids are
    * NEW. Stats are written after the postings append; production layouts
    * should version `root` per refresh for atomic swap — a crash between
    * the two writes leaves stats one delta behind. */
  def appendDelta(df: DataFrame, textCol: String, idCol: String,
                  root: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    def lng(r: org.apache.spark.sql.Row, c: String): Long =
      if (r.isNullAt(r.fieldIndex(c))) 0L else r.getAs[Long](c)
    // heal crashed compaction swaps BEFORE the stats read, and scrub
    // uncommitted streamed batches: readStats sums per-batch delta
    // rows, so an uncommitted batch's stats row would be baked into the
    // canonical overwrite below and then DOUBLE-counted when the stream
    // replays that batch
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/postings")
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/stats")
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/postings", s"$root/stats"))
    val spread = graft.util.Spread.forMapWork(df)
    // both stats frames reduce to ONE row — constant-size driver collects
    // (readStats sums, so a layout carrying streamed per-batch delta rows
    // folds correctly and the overwrite below re-canonicalizes to one row)
    val base = readStats(spark, root).collect()(0)
    val delta = TextOps.bm25CorpusStats(spread, textCol).collect()(0)
    graft.io.Sinks.onePerPartitionValue(
        TextOps.bm25Postings(spread, textCol, idCol)
          .withColumn("bucket", TextOps.bm25Bucket(col("term"))),
        Seq("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$root/postings")
    Seq((lng(base, "n_docs") + lng(delta, "n_docs"),
        lng(base, "dl_sum") + lng(delta, "dl_sum")))
      .toDF("n_docs", "dl_sum")
      .write.mode("overwrite").parquet(s"$root/stats")
  }

  /** O(touched buckets) STORED takedown — the GDPR sweep on the keyword
    * serving layout, completing the BM25 tier's lifecycle symmetry with
    * [[graft.serve.AnnService.removeFromIndex]] and the near-dup
    * partition rewrites: a document's postings can sit in ANY term
    * bucket (postings are term-partitioned, not doc-partitioned), so
    * finding the touched buckets reads the layout's THIN
    * (doc_id, bucket) columns once — but the REWRITE is only the
    * buckets actually holding removed rows (≤ 64 collect; untouched
    * `bucket=` dirs keep their physical files), each swapped through
    * the crash-safe parked rewrite.
    *
    * `removedDocs` carries the removed documents WITH their text (the
    * [[upsertDelta]] oldDocs contract): corpus stats subtract exactly —
    * including indexed EMPTY documents, which have no posting row to
    * recover a dl from, so an id-only takedown could not maintain
    * `n_docs` correctly (the [[TextOps.bm25RemoveIndex]] frame-form
    * rationale). */
  def removeFromIndex(removedDocs: DataFrame, textCol: String,
                      idCol: String, root: String): Unit = {
    val spark = removedDocs.sparkSession
    import spark.implicits._
    // one row per removed id, no nulls: the postings anti-join would
    // dedupe silently while bm25CorpusStats below counted every row —
    // duplicate takedown entries would corrupt n_docs/dl_sum
    graft.util.Guards.requireUniqueIds(removedDocs, idCol,
      "SearchService.removeFromIndex")
    // heal-before-any-layout-read + orphan scrub (the upsertDelta
    // discipline: the bucket rewrite is untagged)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/postings")
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/stats")
    graft.io.Sinks.recoverCrashedRewrite(spark, s"$root/postings")
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/postings", s"$root/stats"))
    val postings = spark.read.parquet(s"$root/postings")
    val ids = removedDocs.select(col(idCol).as("doc_id")).dropDuplicates()
    val touched = postings.join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select("bucket").distinct().as[Int].collect().sorted
    def lng(r: org.apache.spark.sql.Row, c: String): Long =
      if (r.isNullAt(r.fieldIndex(c))) 0L else r.getAs[Long](c)
    val base = readStats(spark, root).collect()(0)
    val removed = TextOps.bm25CorpusStats(removedDocs, textCol).collect()(0)
    if (touched.nonEmpty) {
      val touchedLit = touched.map(Int.box)
      graft.io.Sinks.rewritePartitions(spark, s"$root/postings", "bucket",
        touched.toSeq,
        postings.filter(col("bucket").isin(touchedLit: _*))
          .join(broadcast(ids), Seq("doc_id"), "left_anti"))
    }
    Seq((lng(base, "n_docs") - lng(removed, "n_docs"),
        lng(base, "dl_sum") - lng(removed, "dl_sum")))
      .toDF("n_docs", "dl_sum")
      .write.mode("overwrite").parquet(s"$root/stats")
  }

  /** Document UPDATE on a STORED layout — the
    * [[graft.text.TextOps.bm25UpsertIndex]] twin that rewrites ONLY the
    * touched term buckets: a document's old postings can sit in ANY
    * bucket (postings are term-partitioned, not doc-partitioned), so the
    * removal reads the thin (doc_id, bucket) columns of the whole index
    * once, but the REWRITE is O(touched buckets) — the buckets holding
    * the replaced ids' old rows plus those the new postings land in; the
    * other ≥ 0 of 64 bucket directories keep their physical files
    * untouched (SearchIndexSpec pins this file-identity). Same old/new
    * contract as the frame form (`oldDocs` = currently-indexed versions;
    * `newDocs` may add brand-new ids).
    *
    * Commit shape: the rewritten buckets are fully written to a staging
    * dir FIRST, then swapped in per bucket through
    * [[graft.io.Sinks.rewritePartitions]] — each live bucket is PARKED
    * aside before its replacement renames in, so a crash mid-swap never
    * loses a bucket's surviving rows (the delete-then-rename form did;
    * [[graft.io.Sinks.recoverCrashedRewrite]] heals the window), stats
    * last — a crash between postings and stats leaves stats one upsert
    * behind, so production refreshes should version `root` for atomic
    * cutover (the [[appendDelta]] posture). Streamed batch-tagged files
    * inside a touched bucket fold into its rewrite; their ledger markers
    * stay valid because a replayed committed batch is skipped by marker,
    * not by file presence. */
  def upsertDelta(newDocs: DataFrame, oldDocs: DataFrame, textCol: String,
                  idCol: String, root: String): Unit = {
    val spark = newDocs.sparkSession
    import spark.implicits._
    // one row per id on BOTH sides: duplicate oldDocs rows would
    // subtract corpus stats twice while the anti-join removed their
    // postings once (the removeFromIndex hazard); duplicate newDocs
    // rows would double-insert postings
    graft.util.Guards.requireUniqueIds(oldDocs, idCol,
      "SearchService.upsertDelta (oldDocs)")
    graft.util.Guards.requireUniqueIds(newDocs, idCol,
      "SearchService.upsertDelta (newDocs)")
    // heal BOTH crash shapes BEFORE any layout read (a crashed
    // compaction swap or a crashed prior rewrite would otherwise feed
    // the touched-bucket scan a sparse or partial layout), then drop
    // uncommitted streamed-batch orphans: a touched bucket's rewrite is
    // untagged, and folding a partial batch into it would double-count
    // once the stream replays that batch
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/postings")
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/stats")
    graft.io.Sinks.recoverCrashedRewrite(spark, s"$root/postings")
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/postings", s"$root/stats"))
    val postings = spark.read.parquet(s"$root/postings")
    val ids = oldDocs.select(col(idCol).as("doc_id"))
    val newPostings = TextOps.bm25Postings(
        graft.util.Spread.forMapWork(newDocs), textCol, idCol)
      .withColumn("bucket", TextOps.bm25Bucket(col("term")))
    // ≤ 64-row collect: the union of old-row buckets and new-posting buckets
    val touched = postings.join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select("bucket").distinct()
      .unionByName(newPostings.select("bucket").distinct())
      .distinct().as[Int].collect().sorted
    def lng(r: org.apache.spark.sql.Row, c: String): Long =
      if (r.isNullAt(r.fieldIndex(c))) 0L else r.getAs[Long](c)
    val base = readStats(spark, root).collect()(0)
    val removed = TextOps.bm25CorpusStats(oldDocs, textCol).collect()(0)
    val added = TextOps.bm25CorpusStats(newDocs, textCol).collect()(0)
    if (touched.nonEmpty) {
      val touchedLit = touched.map(Int.box)
      val rewritten = postings
        .filter(col("bucket").isin(touchedLit: _*))
        .join(broadcast(ids), Seq("doc_id"), "left_anti")
        .unionByName(newPostings) // new rows' buckets ⊆ touched by construction
      graft.io.Sinks.rewritePartitions(spark, s"$root/postings", "bucket",
        touched.toSeq, rewritten)
    }
    Seq((lng(base, "n_docs") - lng(removed, "n_docs") + lng(added, "n_docs"),
        lng(base, "dl_sum") - lng(removed, "dl_sum") + lng(added, "dl_sum")))
      .toDF("n_docs", "dl_sum")
      .write.mode("overwrite").parquet(s"$root/stats")
  }
}
