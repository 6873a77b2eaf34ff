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
  *     sk BINARY) PARTITIONED BY d = to_date(h) — one base file-set
  *     plus one delta file-set per streamed micro-batch (deltas land
  *     inside the same date directories); READERS fold by (h, type)
  *     with `kll_merge_agg` + `sum(n)`, and the nightly
  *     [[compactHourly]] materializes that fold back to one row per
  *     (h, type) behind a marker-fenced swap. The date partitioning is
  *     what keeps [[latestTrailing]] output-sized under streaming
  *     RETENTION: the layout grows without bound (years × types of
  *     hourly rows) while a probe's window does not, so the probe scan
  *     must prune to ⌈window/24⌉ + 1 partitions instead of listing and
  *     reading every retained file;
  *   - `root/schema`  a zero-row parquet pinning the hourly schema
  *     (incl. the d partition column) — a freshly-bootstrapped EMPTY
  *     partitioned layout has no data files to infer a schema from,
  *     and readers with a pinned schema also skip inference.
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
    * in the window: (hour_us — the answered as-of hour, GLOBAL across
    * types; event_type; last_data_us — the type's OWN latest hour with
    * n > 0 sketch mass inside the window, NULL for a type whose window
    * rows are all empty-spine heartbeats, so a stalled feed is visible
    * next to the fresh global stamp instead of masked by it;
    * n_samples; p…). Output-sized: |types| rows, sketch-sized work. */
  def latestTrailing(window: Int, ps: Seq[Double] = Seq(0.5, 0.95))
      : DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile ranks must be in [0, 1], got $ps")
    EventAnalytics.requireDistinctLabels(ps)
    // stored layouts carry the DATE partition column d; a frame handed
    // to the constructor directly may not — derive it (same values,
    // just not partition-prunable)
    val hdf =
      if (hourly.columns.contains("d")) hourly
      else hourly.withColumn("d", to_date(col("h")))
    // Find the as-of hour in two partition-pruned driver steps instead
    // of one whole-layout max(h): under streaming retention the layout
    // grows without bound while the probe's window does not — max(d)
    // touches partition values + footers only, max(h) reads ONE date
    // partition, and the window filter below prunes the data scan to
    // ≤ ⌈window/24⌉ + 1 partitions (PartitionFilters, plan-pinned in
    // StreamOpsSpec).
    val maxDRow = hdf.agg(max(col("d"))).head()
    val inWin =
      if (maxDRow.isNullAt(0))
        // empty layout → empty result with the contract schema
        hdf.filter(lit(false))
          .withColumn("__hi", lit(null).cast("timestamp"))
      else {
        val maxD = maxDRow.getDate(0)
        val hi = hdf.filter(col("d") === lit(maxD))
          .agg(max(col("h"))).head().getTimestamp(0)
        val hiLit = lit(hi)
        val loTs = hiLit - expr(s"INTERVAL ${window - 1} HOURS")
        hdf.filter(col("d") >= to_date(loTs) && col("d") <= lit(maxD)
            && col("h") >= loTs && col("h") <= hiLit)
          .withColumn("__hi", hiLit)
      }
    val qCols = ps.map { p =>
      round(expr(s"kll_quantile(__m, ${p}D)"), 6)
        .as(EventAnalytics.qLabel(p))
    }
    inWin.groupBy("event_type")
      .agg(max(unix_micros(col("__hi"))).as("hour_us"),
        max(when(col("n") > 0, unix_micros(col("h"))))
          .as("last_data_us"),
        sum(col("n")).as("n_samples"),
        expr(s"kll_merge_agg(sk, $k)").as("__m"))
      .select(Seq(col("hour_us"), col("event_type"), col("last_data_us"),
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
    * stream; the schema sidecar keeps the fileless partitioned layout
    * readable). */
  def buildLayout(events: DataFrame, typeCol: String, tsCol: String,
                  valueCol: String, root: String, k: Int = 200,
                  numFiles: Int = 1): Unit = {
    require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")
    val spark = events.sparkSession
    import spark.implicits._
    Seq(k).toDF("k").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/meta")
    val sk = hourlySketches(events, typeCol, tsCol, valueCol, k)
      .withColumn("d", to_date(col("h")))
    // zero-row schema sidecar (limit(0) folds to an empty local
    // relation — no event scan)
    sk.limit(0).coalesce(1).write.mode("overwrite")
      .parquet(s"$root/schema")
    sk.coalesce(numFiles).write.mode("overwrite")
      .partitionBy("d").parquet(s"$root/hourly")
  }

  /** The layout's pinned sketch resolution. */
  def kOf(spark: SparkSession, root: String): Int =
    spark.read.parquet(s"$root/meta").head().getInt(0)

  /** Read `root/hourly` with the pinned schema sidecar when present: a
    * freshly-bootstrapped EMPTY partitioned layout has no data files to
    * infer from, and pinning also spares every probe the inference
    * pass. Pre-sidecar layouts (a frame built by hand) fall back to
    * inference. */
  private def readHourly(spark: SparkSession, root: String): DataFrame = {
    val sd = new org.apache.hadoop.fs.Path(s"$root/schema")
    val fs = sd.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sd))
      spark.read.schema(spark.read.parquet(s"$root/schema").schema)
        .parquet(s"$root/hourly")
    else spark.read.parquet(s"$root/hourly")
  }

  /** ONE-TIME migration of a pre-partitioning (flat) layout to the
    * date-partitioned contract. The sidecar's absence IS the legacy
    * marker: a flat `root/hourly` always holds ≥ 1 schema-bearing
    * part-file (even when empty — the old non-partitioned write emitted
    * one), so its rows rewrite into d = to_date(h) partitions behind
    * the family's marker-fenced swap, and the schema sidecar is written
    * LAST — crash ordering: a crash mid-rewrite leaves the flat layout
    * and no sidecar (re-run redoes everything); a crash between the
    * swap and the sidecar leaves a partitioned layout and no sidecar
    * (re-run re-reads it by inference — d is then a real partition
    * column — and completes; one wasted rewrite, no wrong answer).
    * Without this migration, the first streamed delta would drop d=...
    * directories NEXT TO the legacy flat files and Spark's partition
    * discovery would reject the mixed layout for every subsequent
    * reader. Idempotent; costs one exists() once migrated. Runs under
    * the same quiescence contract as the maintenance ops (no live
    * ingest mid-migration). */
  private[graft] def migrateLegacyLayout(spark: SparkSession,
                                         root: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$root/schema"))) return
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$root/hourly"))) return
    val flat = spark.read.parquet(s"$root/hourly")
    val withD =
      if (flat.columns.contains("d")) flat
      else flat.withColumn("d", to_date(col("h")))
    // capture the schema NOW — the sidecar writes after the swap, when
    // the flat source files this plan reads no longer exist
    val layoutSchema = withD.schema
    val tmp = s"$root/hourly-__rebuilding__"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    withD.coalesce(1).write.mode("overwrite")
      .partitionBy("d").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/hourly", tmp)
    spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        layoutSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$root/schema")
  }

  /** Open a stored layout for serving (crashed swaps healed first —
    * the family contract). */
  def overParquetDir(spark: SparkSession, root: String)
      : RollingQuantileService = {
    graft.io.Sinks.recoverCrashedSwap(spark, root)
    graft.io.Sinks.recoverCrashedSwap(spark, s"$root/hourly")
    migrateLegacyLayout(spark, root)
    new RollingQuantileService(readHourly(spark, root), kOf(spark, root))
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
    migrateLegacyLayout(spark, root)
    val k = kOf(spark, root)
    val tmp = s"$root/hourly-__rebuilding__"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // crashed attempt
    readHourly(spark, root)
      .groupBy(col("h"), col("event_type"))
      .agg(sum(col("n")).as("n"),
        expr(s"kll_merge_agg(sk, $k)").as("sk"))
      .withColumn("d", to_date(col("h")))
      .coalesce(numFiles).write.mode("overwrite")
      .partitionBy("d").parquet(tmp)
    graft.io.Sinks.swapDir(spark, s"$root/hourly", tmp)
  }
}
