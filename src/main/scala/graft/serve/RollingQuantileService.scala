package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.EventAnalytics

/** Request-time TRAILING-WINDOW QUANTILES over a STORED per-(hour, type)
  * KLL sketch layout — the build-once / probe-cheap tier of the
  * rolling-quantile family, and the TENTH streamed index family. The
  * headline faces re-sketch the raw event stream per invocation
  * ([[graft.ops.EventAnalytics.rollingHourlyQuantilesSketch]] — one full
  * scan each time); the per-hour sketches are a trained-artifact-shaped
  * layout exactly like DSIR marginals (mergeable, additive,
  * nightly-foldable: Karnin-Lang-Liberty mergeability is the entire
  * point), so this tier sketches each hour ONCE — at batch build or as
  * streamed micro-batch deltas
  * ([[graft.streaming.StreamOps.rollingQuantileIngestStream]]) — and
  * answers "p95 over the last 24 h, per type, right now" by merging
  * ≤ `window` CONSTANT-SIZE sketch rows per probe: sketch-sized work at
  * serving time, never an event-stream rescan. At 100 TB the raw events
  * are written once and the operational quantile dashboard reads only
  * this hours × types layout.
  *
  * Layout at `root`:
  *   - `root/meta`    one row (k INT) — the sketch resolution is the
  *     layout identity (like RP's (dimOut, seed)): every delta must
  *     sketch at the same k or merges would silently degrade, so k is
  *     pinned in the layout and recovered, never passed per call;
  *   - `root/hourly`  (h TIMESTAMP, event_type STRING, n BIGINT,
  *     sk BINARY) — one base file-set plus one delta file-set per
  *     streamed micro-batch; READERS fold by (h, type) with
  *     `kll_merge_agg` + `sum(n)`, and the nightly [[compactHourly]]
  *     materializes that fold back to one row per (h, type) behind a
  *     marker-fenced swap.
  *
  * Certification: n_samples is integer-exact end-to-end (hash-grade);
  * quantile estimates are KLL rank-error approximations with
  * engine-local randomness — the probe face is rows-only by the KLL
  * contract, twinned by the hash-green exact `evt_rolling_quantiles`
  * face, and StreamOpsSpec pins streamed-folded ≡ batch within the
  * k = 200 rank-error envelope plus exactly-once delivery under
  * kill-and-replay. */
final class RollingQuantileService(hourly: DataFrame, val k: Int) {
  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  /** One sketch row per (h, type) regardless of how many streamed
    * delta file-sets the layout currently carries — the reader-side
    * fold every probe composes over (constant-size payloads; the
    * groupBy moves sketch rows, not events). */
  private def folded: DataFrame =
    hourly.groupBy(col("h"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        expr(s"kll_merge_agg(sk, $k)").as("sk"))

  /** The full trailing-window series over the stored hours — the same
    * output contract as [[graft.ops.EventAnalytics
    * .rollingHourlyQuantilesSketch]] (hour_us, event_type, n_samples,
    * p…), but FROM the stored layout: no event scan, the window stage
    * merges ≤ `window` stored sketches per output row. The window
    * stage IS the in-query face's
    * ([[graft.ops.EventAnalytics.trailingSketchWindow]] — one shared
    * implementation, so stored and in-query answers cannot drift), and
    * [[graft.ops.EventAnalytics.hourlySketches]] keeps all-null
    * (h, type) groups as n = 0 rows, so the stored spine matches the
    * in-query spine by construction even for heartbeat/null-valued
    * event feeds. */
  def trailingSeries(window: Int, ps: Seq[Double] = Seq(0.5, 0.95))
      : DataFrame =
    EventAnalytics.trailingSketchWindow(folded, window, ps, k)

  /** The OPERATIONAL probe — "the trailing `window`-hour quantiles per
    * type, as of the latest stored hour": filters the layout to the
    * last `window` hours (partition-prunable at scale) and merges
    * ≤ `window` sketches per type. Returns one row per type with data
    * in the window: (hour_us — the answered as-of hour, event_type,
    * n_samples, p…). Output-sized: |types| rows, sketch-sized work. */
  def latestTrailing(window: Int, ps: Seq[Double] = Seq(0.5, 0.95))
      : DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile ranks must be in [0, 1], got $ps")
    EventAnalytics.requireDistinctLabels(ps)
    // max over the RAW layout rows — folding first would pay a
    // (h, type) sketch-merge shuffle just to find the latest hour
    val hi = hourly.agg(max(col("h")).as("hi"))
    val inWin = hourly.crossJoin(broadcast(hi))
      .filter(col("h") >= col("hi") - expr(s"INTERVAL ${window - 1} HOURS")
        && col("h") <= col("hi"))
    val qCols = ps.map { p =>
      round(expr(s"kll_quantile(__m, ${p}D)"), 6)
        .as(EventAnalytics.qLabel(p))
    }
    inWin.groupBy("event_type")
      .agg(max(unix_micros(col("hi"))).as("hour_us"),
        sum(col("n")).as("n_samples"),
        expr(s"kll_merge_agg(sk, $k)").as("__m"))
      .select(Seq(col("hour_us"), col("event_type"),
        col("n_samples")) ++ qCols: _*)
  }
}

object RollingQuantileService {

  /** One sketch row per (hour, type) for an event batch — delegates to
    * the shared [[graft.ops.EventAnalytics.hourlySketches]] (the SAME
    * derivation the in-query face uses, all-null groups kept as n = 0
    * rows so stored spines match in-query spines). */
  def hourlySketches(events: DataFrame, typeCol: String, tsCol: String,
                     valueCol: String, k: Int): DataFrame =
    EventAnalytics.hourlySketches(events, typeCol, tsCol, valueCol, k)

  /** Build the full stored layout at `root` from a batch event frame
    * (an EMPTY frame is fine — bootstrap everything through the
    * stream). */
  def buildLayout(events: DataFrame, typeCol: String, tsCol: String,
                  valueCol: String, root: String, k: Int = 200,
                  numFiles: Int = 1): Unit = {
    require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
    val spark = events.sparkSession
    import spark.implicits._
    Seq(k).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/meta")
    hourlySketches(events, typeCol, tsCol, valueCol, k)
      .coalesce(numFiles).write.mode("overwrite").parquet(s"$root/hourly")
  }

  /** The layout's pinned sketch resolution. */
  def kOf(spark: SparkSession, root: String): Int =
    spark.read.parquet(s"$root/meta").head().getInt(0)

  /** Open a stored layout for serving (crashed swaps healed first —
    * the family contract). */
  def overParquetDir(spark: SparkSession, root: String)
      : RollingQuantileService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/hourly")
    new RollingQuantileService(spark.read.parquet(s"$root/hourly"),
      kOf(spark, root))
  }

  /** FOLD streamed sketch deltas back to one row per (hour, type) —
    * the nightly of the streamed layout (KLL merge IS the fold, the
    * DSIR-marginal discipline): sum counts, merge sketches, rewrite
    * `root/hourly` behind a marker-fenced swap. Costs sketch-row
    * arithmetic, never an event rescan. Callers run
    * [[graft.streaming.BatchCommit.scrubUncommitted]] first (the
    * [[Maintenance.nightlyRollingQuantiles]] entry does) so a crashed
    * micro-batch's partial files are never folded into the untagged
    * rewrite. */
  def compactHourly(spark: SparkSession, root: String,
                    numFiles: Int = 1): Unit = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/hourly")
    val k = kOf(spark, root)
    val tmp = s"$root/hourly-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    spark.read.parquet(s"$root/hourly")
      .groupBy(col("h"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        expr(s"kll_merge_agg(sk, $k)").as("sk"))
      .coalesce(numFiles).write.mode("overwrite").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/hourly", tmp)
  }
}
