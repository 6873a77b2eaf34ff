package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextOps

/** Request-time BIGRAM-LM quality scoring over a STORED model layout —
  * the build-once / probe-cheap tier of the CCNet-style perplexity
  * filter ([[graft.text.TextOps.ngramLmScore]] retrains the model from
  * the scored corpus on EVERY call; at 100 TB the model is trained
  * once — or streamed — and every incoming batch scores O(batch)
  * against it), and the engine's ELEVENTH streamed index family: both
  * model tables are plain additive counts, so micro-batch deltas
  * ([[graft.streaming.StreamOps.lmIngestStream]]) fold to exactly the
  * full-corpus model — stream-folded ≡ full retrain BIT-IDENTICAL, the
  * DSIR-marginal discipline (StreamOpsSpec-pinned).
  *
  * Layout at `root`:
  *   - `root/bigrams` (w, nxt, c BIGINT) — bigram counts, base
  *     file-set + one delta file-set per streamed micro-batch;
  *   - `root/words`   (w, c BIGINT) — word-occurrence counts; kept as
  *     COUNTS (not a distinct set) precisely so vocabulary size
  *     survives additive folding: V = folded row count.
  * Context totals cw derive from the bigram table (Σ over nxt), so
  * they are never stored and can never drift from the bigrams.
  *
  * Certification: scoring the training corpus replays the in-query
  * [[graft.text.TextOps.ngramLmScore]] bit-for-bit → the stored probe
  * face `txt_lm_probe` is HASH-GREEN against the same oracle as
  * `txt_lm_score`; held-out scoring (unseen bigrams/contexts hit the
  * add-one smoothing floor) is hash-green via `txt_lm_transfer`. */
final class LmService(bigrams: DataFrame, words: DataFrame) {

  /** Folded model views — one row per key regardless of how many
    * streamed delta file-sets the layout carries (model-sized
    * groupBys, never corpus-sized). */
  private def foldedBigrams: DataFrame =
    bigrams.groupBy("w", "nxt").agg(sum(col("c")).as("c"))
  private def foldedWords: DataFrame =
    words.groupBy("w").agg(sum(col("c")).as("c"))

  /** Score a document batch against the stored model —
    * (doc_id, n_bigrams, lm_logp), O(batch) + model-sized joins. */
  def score(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    TextOps.lmScoreAgainst(docs, textCol, idCol, foldedBigrams, foldedWords)

  /** The model's vocabulary size (folded distinct words) — the V of
    * the smoothing denominator; a health number for the nightly.
    * MEMOIZED per service instance: the folded count is immutable for
    * the layout snapshot this instance opened, so repeated health reads
    * (a nightly loop, a dashboard) must not re-run the fold job — open
    * a fresh service after a layout swap for a fresh read. */
  lazy val vocabSize: Long = foldedWords.count()
}

object LmService {

  /** Train the model tables from a document corpus and store the full
    * layout at `root` — ONE corpus pass, model-sized output. An EMPTY
    * corpus is fine (bootstrap everything through the stream). */
  def buildLayout(docs: DataFrame, textCol: String, idCol: String,
                  root: String, numFiles: Int = 1): Unit = {
    val (bg, w) = TextOps.lmBatchCounts(docs, textCol, idCol)
    bg.coalesce(numFiles).write.mode("overwrite").parquet(s"$root/bigrams")
    w.coalesce(numFiles).write.mode("overwrite").parquet(s"$root/words")
  }

  /** Open a stored layout for serving (crashed swaps healed first —
    * the family contract). */
  def overParquetDir(spark: SparkSession, root: String): LmService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/bigrams")
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/words")
    new LmService(spark.read.parquet(s"$root/bigrams"),
      spark.read.parquet(s"$root/words"))
  }

  /** FOLD streamed count deltas back to one row per key — the nightly
    * of the streamed layout (integer addition IS the fold): groupBy-sum
    * both tables, rewrite behind marker-fenced swaps. Model-sized
    * arithmetic, never a corpus rescan. Callers scrub uncommitted
    * batches first ([[Maintenance.nightlyLmFold]] does). */
  def compactModel(spark: SparkSession, root: String,
                   numFiles: Int = 1): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/bigrams")
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/words")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fold(sub: String, keys: Seq[String]): Unit = {
      val tmp = s"$root/$sub-__rebuilding__"
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
      spark.read.parquet(s"$root/$sub")
        .groupBy(keys.map(col): _*).agg(sum(col("c")).as("c"))
        .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
      graft.io.Sinks.swapDir(spark, s"$root/$sub", tmp)
    }
    fold("bigrams", Seq("w", "nxt"))
    fold("words", Seq("w"))
  }
}
