package graft.serve

import graft.SparkSpec
import graft.text.TextOps
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Incremental maintenance of the stored BM25 layout: appendDelta must
  * produce byte-for-byte the index a full rebuild would (postings row set
  * + stats), touch ONLY the delta's term buckets, and never rewrite a
  * base file — the O(delta + touched buckets) contract. */
class SearchIndexSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Set[String] = {
    val root = java.nio.file.Paths.get(dir)
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala
      .filter(p => java.nio.file.Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSet
    finally s.close()
  }

  test("appendDelta: merged ≡ rebuilt, base files untouched, " +
      "only delta-term buckets gain files") {
    val base = Seq((1L, "Apple banana apple"), (2L, "banana"))
      .toDF("doc_id", "text")
    val delta = Seq((3L, "cherry apple"), (4L, "")).toDF("doc_id", "text")
    val mergedRoot =
      java.nio.file.Files.createTempDirectory("idx_merged_").toString
    val rebuiltRoot =
      java.nio.file.Files.createTempDirectory("idx_rebuilt_").toString

    SearchService.buildIndex(base, "text", "doc_id", mergedRoot)
    val before = parquetFiles(s"$mergedRoot/postings")
    SearchService.appendDelta(delta, "text", "doc_id", mergedRoot)
    val after = parquetFiles(s"$mergedRoot/postings")

    // incrementality: every base file survives untouched; every NEW file
    // lives in a bucket of one of the delta's terms
    assert(before.subsetOf(after), "append rewrote base postings files")
    val newFiles = after -- before
    assert(newFiles.nonEmpty, "delta produced no postings files")
    val deltaBuckets = Seq("cherry", "apple").map(tm =>
      spark.range(1).select(TextOps.bm25Bucket(lit(tm))).first().getInt(0))
      .toSet
    assert(newFiles.forall(f =>
        deltaBuckets.exists(b => f.contains(s"bucket=$b/"))),
      s"delta files outside the delta's term buckets: $newFiles")

    // equivalence: merged index ≡ full from-scratch rebuild
    SearchService.buildIndex(base.unionByName(delta), "text", "doc_id",
      rebuiltRoot)
    def postingRows(root: String): Set[String] =
      spark.read.parquet(s"$root/postings")
        .select("term", "doc_id", "tf", "dl", "bucket")
        .collect().map(_.toString).toSet
    assert(postingRows(mergedRoot) === postingRows(rebuiltRoot))
    val mergedStats = spark.read.parquet(s"$mergedRoot/stats")
      .select("n_docs", "dl_sum").first()
    assert(mergedStats.getLong(0) === 4L) // the empty delta doc counts
    assert(mergedStats.getLong(1) === 6L) // 3 + 1 + 2 + 0
    assert(mergedStats ===
      spark.read.parquet(s"$rebuiltRoot/stats")
        .select("n_docs", "dl_sum").first())

    // serving: a SearchService over the MERGED layout ranks exactly like
    // one over the rebuild — and hits the post-delta doc
    val merged = SearchService.overParquetDir(spark, mergedRoot, maxK = 10)
    val rebuilt = SearchService.overParquetDir(spark, rebuiltRoot, maxK = 10)
    val hits = merged.topK(Seq("apple", "banana"), 3)
    assert(hits === rebuilt.topK(Seq("apple", "banana"), 3))
    assert(hits.map(_._1) === Seq(1L, 2L, 3L), hits.toString)
  }

  test("bm25RemoveIndex: removed ≡ rebuilt-on-remainder; an empty " +
      "removed doc still decrements n_docs") {
    import graft.text.TextOps
    import org.apache.spark.sql.functions.col
    val df = Seq((1L, "Apple banana apple"), (2L, "banana"),
      (3L, "cherry apple"), (4L, "")).toDF("doc_id", "text")
    // remove doc 3 AND the empty doc 4 — the empty doc has no postings
    // row, so only the handed-in document text can recover its stats
    val (p, st) = TextOps.bm25RemoveIndex(
      TextOps.bm25Postings(df, "text", "doc_id"),
      TextOps.bm25CorpusStats(df, "text"),
      df.filter(col("doc_id") >= 3), "text", "doc_id")
    val remainder = df.filter(col("doc_id") < 3)
    def rows(d: org.apache.spark.sql.DataFrame): Set[String] =
      d.select("term", "doc_id", "tf", "dl").collect().map(_.toString).toSet
    assert(rows(p) === rows(TextOps.bm25Postings(remainder, "text", "doc_id")))
    val got = st.select("n_docs", "dl_sum").first()
    assert(got === TextOps.bm25CorpusStats(remainder, "text")
      .select("n_docs", "dl_sum").first())
    assert(got.getLong(0) === 2L && got.getLong(1) === 4L)
  }
}
