package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import graft.expr.Exprs

/** Sinks (SURVEY.md §2.2 K1–K3).
  *
  * Reference sites: CSV persist dag1.py:199-209; DDL synthesis
  * dag1.py:257-270; DELETE + COPY full refresh dag1.py:272-287.
  *
  * Scale notes: CSV sink is distributed (one part-file per partition — no
  * driver funnel; pass coalesce=1 only for tiny dims). The JDBC full
  * refresh maps the reference's truncate-and-reload onto Spark's
  * `overwrite` + `truncate`, writing from all partitions in parallel with
  * `batchsize` batching. */
object Sinks {

  /** K1 — CSV sink with header, full-refresh overwrite (dag1.py:199-209). */
  def csv(df: DataFrame, path: String, coalesce: Int = 0): DataFrame = {
    val out = if (coalesce > 0) df.coalesce(coalesce) else df
    out.write.mode(SaveMode.Overwrite).option("header", true).csv(path)
    df
  }

  /** JSON-lines sink, full-refresh overwrite — the interchange format of
    * LLM-corpus tooling (one JSON object per line; splittable, schema
    * rides with the data). Distributed write, one part-file per
    * partition. */
  def jsonLines(df: DataFrame, path: String, coalesce: Int = 0): DataFrame = {
    val out = if (coalesce > 0) df.coalesce(coalesce) else df
    out.write.mode(SaveMode.Overwrite).json(path)
    df
  }

  /** XML sink (Spark 4 native datasource), full-refresh overwrite: one
    * `<rowTag>` element per row. Round-trips with [[Sources.xml]]. */
  def xml(df: DataFrame, path: String, rowTag: String,
          coalesce: Int = 0): DataFrame = {
    val out = if (coalesce > 0) df.coalesce(coalesce) else df
    out.write.mode(SaveMode.Overwrite).format("xml")
      .option("rowTag", rowTag).save(path)
    df
  }

  /** Small-file compaction: rewrite a parquet dataset into `targetFiles`
    * files. The chronic data-lake ailment at scale — a streaming or
    * per-batch writer leaves thousands of KB-sized files and every
    * downstream scan pays per-file open/footer costs plus scheduler
    * pressure; periodic compaction restores healthy file sizes.
    * `repartition` (round-robin shuffle) balances output sizes even when
    * the input files are skewed; rows are bit-identical, order is not
    * (parquet readers don't promise order anyway). */
  def compactParquet(spark: org.apache.spark.sql.SparkSession,
                     inPath: String, outPath: String,
                     targetFiles: Int): DataFrame = {
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    // HARD GUARD: pointed at a hive-partitioned layout (key=value
    // subdirs) this op would round-robin everything into an UNPARTITIONED
    // output — silently destroying the partition pruning every stored
    // index probe depends on. Refuse loudly; compactLayout is the
    // partition-preserving form.
    val inP = new org.apache.hadoop.fs.Path(inPath)
    val inFs = inP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (inFs.exists(inP)) {
      val partDir = inFs.listStatus(inP)
        .find(st => st.isDirectory && st.getPath.getName.contains("="))
      require(partDir.isEmpty,
        s"$inPath is a partitioned layout (found ${partDir.get.getPath.getName}/); " +
          "compactParquet would silently drop the partitioning probes rely " +
          "on — use compactLayout, which preserves partitionBy")
    }
    val df = spark.read.parquet(inPath)
    df.repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** PARTITION-PRESERVING compaction — the maintenance op stored index
    * layouts need: months of O(delta) appends and streaming micro-batches
    * leave thousands of small files inside a `partitionBy(cell)` /
    * `partitionBy(bucket)` layout, and every probe pays per-file
    * open/footer costs; this rewrites each partition's files down to
    * `filesPerPartition` while keeping the `key=value` directory
    * structure — and therefore the partition pruning — intact
    * (SinksSpec re-runs the pruning plan audit over a compacted layout).
    *
    * Mechanics: one hash shuffle on the partition values co-locates each
    * value's rows on one task, so the `partitionBy` write emits exactly
    * one file per value; `filesPerPartition > 1` adds a deterministic
    * content-hash salt to the shuffle key — the skew-relief knob for a
    * hot partition that would otherwise funnel through a single task.
    * Rows are bit-identical, order is not (parquet promises none).
    * Ledger/metadata subpaths (`_*`) are invisible to the parquet reader
    * and are NOT carried over — compact dataset directories (e.g.
    * `root/postings`), not layout roots. */
  def compactLayout(spark: org.apache.spark.sql.SparkSession,
                    inPath: String, outPath: String,
                    partitionCols: Seq[String],
                    filesPerPartition: Int = 1): DataFrame = {
    require(partitionCols.nonEmpty,
      "compactLayout needs partition columns (compactParquet is the unpartitioned form)")
    require(filesPerPartition > 0,
      s"filesPerPartition must be positive, got $filesPerPartition")
    val df = spark.read.parquet(inPath)
    val missing = partitionCols.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"partition column(s) ${missing.mkString(", ")} not present in $inPath " +
        s"(found: ${df.columns.mkString(", ")})")
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    val keys = partitionCols.map(col)
    val parted =
      if (filesPerPartition == 1) df.repartition(keys: _*)
      else {
        // deterministic content-hash salt splits a hot value across up to
        // filesPerPartition tasks. The EXPLICIT partition count matters:
        // a bare repartition(cols) is AQE-coalescible, and coalescing the
        // small salted partitions back onto one task would undo the split
        // (one task writes one file per partition value)
        val dataCols = df.columns.filterNot(partitionCols.contains).map(col)
        val n = math.max(df.sparkSession.sessionState.conf.numShufflePartitions,
          filesPerPartition)
        df.repartition(n,
          keys :+ pmod(xxhash64(dataCols: _*), lit(filesPerPartition.toLong)): _*)
      }
    parted.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(outPath)
    spark.read.parquet(outPath)
  }

  /** [[compactLayout]] with a versioned-directory swap — the in-place
    * form a nightly maintenance job calls on a live layout: the compacted
    * copy is fully written to a sibling version directory FIRST, then two
    * renames swap it in (`root` → `root-__old__` → deleted). The window
    * where `root` is absent is two metadata renames wide; a reader that
    * opens mid-swap fails loudly (no such path) rather than ever seeing
    * half-compacted data, and a crash mid-swap leaves the full old or
    * full new directory recoverable next run. Batch-commit ledgers live
    * OUTSIDE the dataset dir (`<layoutRoot>/_ledger`), so replay
    * protection survives compaction of `<layoutRoot>/postings` etc. */
  def compactLayoutInPlace(spark: org.apache.spark.sql.SparkSession,
                           root: String, partitionCols: Seq[String],
                           filesPerPartition: Int = 1): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root + "-__compacting__")
    val old = new org.apache.hadoop.fs.Path(root + "-__old__")
    recoverCrashedSwap(f, p, old) // BEFORE any delete — __old__ may be the only copy
    f.delete(tmp, true) // a crashed previous attempt
    f.delete(old, true)
    compactLayout(spark, root, tmp.toString, partitionCols, filesPerPartition)
    doSwap(f, p, tmp, old)
    spark.read.parquet(root)
  }

  /** Co-locate each partition value's rows on one task before a
    * `partitionBy` write, so the write lands ONE file per touched value
    * instead of (input tasks × touched values) shards — the per-write
    * prophylaxis for the small-file pathology [[compactLayout]] repairs
    * after the fact. Staged streaming micro-batches and index builds
    * route through this; the explicit partition count keeps AQE from
    * coalescing the shuffle (harmless for file counts, but it would
    * serialize big builds through a few tasks). */
  def onePerPartitionValue(df: DataFrame,
                           partitionCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.repartition(
      math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 1),
      partitionCols.map(col): _*)
  }

  /** Staging write + per-partition directory swap — the O(touched
    * partitions) delete/rewrite primitive every stored-layout takedown
    * shares ([[graft.serve.NearDupService.removeFromIndex]] on
    * `idgrp`/`bgrp`, the ANN tiers on `cell`): `replacement` must hold
    * the COMPLETE new contents of exactly the `touched` partitions (it
    * may legitimately lose a partition entirely — then the live dir is
    * just deleted). Untouched partitions keep their physical files —
    * the property that makes a takedown O(removed), not O(index).
    * Each partition's swap is a delete + rename pair; a crash mid-loop
    * leaves already-swapped partitions new and the rest old — safe for
    * DELETES (re-running the takedown converges; no removed row is
    * resurrected), which is why this primitive is for removal rewrites,
    * not for content replacement (use a versioned whole-dir swap
    * there). */
  private[graft] def rewritePartitions(spark: org.apache.spark.sql.SparkSession,
                                       dir: String, partCol: String,
                                       touched: Seq[Int],
                                       replacement: DataFrame): Unit = {
    val staging = s"$dir-__rewrite__"
    val aside = s"$dir-__replaced__"
    val conf = spark.sparkContext.hadoopConfiguration
    val stagingPath = new org.apache.hadoop.fs.Path(staging)
    val asidePath = new org.apache.hadoop.fs.Path(aside)
    val fs = stagingPath.getFileSystem(conf)
    // a crashed PREVIOUS rewrite must have been healed BEFORE the caller
    // scanned the layout for its touched set — if anything needed
    // restoring now, that scan missed the parked partitions and the
    // replacement frame is wrong for them; fail instead of proceeding
    require(!recoverCrashedRewrite(spark, dir),
      s"a crashed partition rewrite under $dir was just recovered — the " +
        "caller's touched-partition scan predates the recovery; rerun " +
        "the operation (its entry point should call recoverCrashedRewrite " +
        "before reading the layout)")
    fs.delete(stagingPath, true)
    onePerPartitionValue(replacement, Seq(partCol))
      .write.partitionBy(partCol).parquet(staging)
    // per-partition swap parks the ORIGINAL dir aside instead of
    // deleting it: a crash between the two renames leaves the
    // partition's surviving rows recoverable from the aside dir (the
    // round-14 review found the delete-then-rename form lost every
    // survivor of a partition if the process died in between)
    fs.mkdirs(asidePath)
    touched.foreach { g =>
      val live = new org.apache.hadoop.fs.Path(s"$dir/$partCol=$g")
      val fresh = new org.apache.hadoop.fs.Path(s"$staging/$partCol=$g")
      val parked = new org.apache.hadoop.fs.Path(s"$aside/$partCol=$g")
      if (fs.exists(live))
        require(fs.rename(live, parked), s"park failed for $partCol=$g")
      if (fs.exists(fresh))
        require(fs.rename(fresh, live), s"swap failed for $partCol=$g")
    }
    fs.delete(asidePath, true)
    fs.delete(stagingPath, true)
  }

  /** Heal a crashed [[rewritePartitions]] for `dir` — every takedown
    * entry point calls this BEFORE scanning the layout for its touched
    * partitions: a partition parked in `dir-__replaced__` whose live dir
    * is missing was mid-swap when the process died; its rows (removed
    * AND surviving) are restored, and the re-issued takedown then
    * re-removes cleanly. Parked partitions whose live dir EXISTS are
    * stale leftovers of a completed swap and are dropped with the aside
    * dir. Returns whether anything was restored. */
  def recoverCrashedRewrite(spark: org.apache.spark.sql.SparkSession,
                            dir: String): Boolean = {
    val asidePath = new org.apache.hadoop.fs.Path(s"$dir-__replaced__")
    val fs = asidePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var restored = false
    if (fs.exists(asidePath)) {
      fs.listStatus(asidePath).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory && name.contains("=")) {
          val live = new org.apache.hadoop.fs.Path(s"$dir/$name")
          if (!fs.exists(live)) {
            require(fs.rename(st.getPath, live),
              s"crash recovery failed restoring $name to $dir")
            restored = true
          }
        }
      }
      fs.delete(asidePath, true)
    }
    restored
  }

  /** Heal a crashed versioned-directory swap for `root` — PUBLIC because
    * every maintenance op that READS a root before swapping it
    * (retrains, compactions) must run this FIRST: recovery placed only
    * inside the swap call would come after the reads that need it, and
    * the op would fail (or worse, derive its replacement from a
    * writer-recreated sparse root) before ever reaching it.
    *
    * States healed, keyed by the `-__swap_pending__` marker
    * [[doSwap]] writes around its two renames:
    *   - marker + `__old__` present ⇒ the swap never completed and
    *     `__old__` is authoritative. If `root` meanwhile REAPPEARED (an
    *     append-mode writer or a streamed batch recreates a missing
    *     directory), its data files — including `_ledger/batch-*`
    *     markers, whose names don't start with `_` — are folded INTO
    *     `__old__` by relative path before the restore, so interim
    *     ingest survives the rollback; then `__old__` is renamed back.
    *     Without the fold-and-restore, the next run's
    *     delete-the-leftovers preamble would destroy the only full copy
    *     (`root` present looks healthy) — permanent silent loss.
    *   - marker + no `__old__` ⇒ crash before the first rename or after
    *     the old-dir delete; `root` is authoritative, drop the marker.
    *   - no marker + `root` absent + `__old__` present ⇒ a legacy
    *     (pre-marker) crashed swap; restore `__old__`.
    * No-op in every healthy state. Rollback over salvage: `__old__`
    * holds the same rows the crashed attempt was re-laying-out, so
    * restoring it loses only the maintenance work, never data. */
  def recoverCrashedSwap(spark: org.apache.spark.sql.SparkSession,
                         root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    recoverCrashedSwap(p.getFileSystem(spark.sparkContext.hadoopConfiguration),
      p, new org.apache.hadoop.fs.Path(root + "-__old__"))
  }

  private def pendingMarker(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root.toString + "-__swap_pending__")

  private def recoverCrashedSwap(f: org.apache.hadoop.fs.FileSystem,
                                 root: org.apache.hadoop.fs.Path,
                                 old: org.apache.hadoop.fs.Path): Unit = {
    val pending = pendingMarker(root)
    if (f.exists(pending)) {
      if (f.exists(old)) {
        if (f.exists(root)) {
          moveTreeInto(f, root, old)
          f.delete(root, true)
        }
        require(f.rename(old, root),
          s"crash recovery failed: could not restore $old to $root")
      }
      f.delete(pending, false)
    } else if (!f.exists(root) && f.exists(old)) {
      require(f.rename(old, root),
        s"crash recovery failed: could not restore $old to $root")
    }
  }

  /** Move every data file under `src` into `dst`, preserving relative
    * subpaths — the fold half of crash recovery. Name-based filtering
    * (skip `_*`/`.*` FILES, keep everything else) deliberately carries
    * `_ledger/batch-N` markers (the file name is `batch-N`): dropping a
    * marker while folding its batch's data files would let the next
    * scrub delete rows whose replay the checkpoint already skipped. */
  private def moveTreeInto(f: org.apache.hadoop.fs.FileSystem,
                           src: org.apache.hadoop.fs.Path,
                           dst: org.apache.hadoop.fs.Path): Unit = {
    val srcUri = src.toUri.getPath
    val it = f.listFiles(src, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val rel = st.getPath.toUri.getPath.stripPrefix(srcUri).stripPrefix("/")
        val parent = rel.lastIndexOf('/') match {
          case -1 => dst
          case i  => new org.apache.hadoop.fs.Path(dst, rel.substring(0, i))
        }
        f.mkdirs(parent)
        require(f.rename(st.getPath, new org.apache.hadoop.fs.Path(parent, name)),
          s"crash recovery failed folding ${st.getPath} into $parent")
      }
    }
  }

  /** The marker-fenced two-rename swap every in-place maintenance op
    * funnels through: `tmp` must already hold the COMPLETE replacement.
    * The `-__swap_pending__` marker brackets exactly the non-atomic
    * window (created after `tmp` is complete, removed after the old dir
    * is gone), so [[recoverCrashedSwap]] can tell "old is the only full
    * copy" from "old is a stale leftover" even when a writer recreates
    * `root` in between. The window where `root` is absent stays two
    * metadata renames wide — a reader opening mid-swap fails loudly
    * rather than seeing partial data. */
  private def doSwap(f: org.apache.hadoop.fs.FileSystem,
                     root: org.apache.hadoop.fs.Path,
                     tmp: org.apache.hadoop.fs.Path,
                     old: org.apache.hadoop.fs.Path): Unit = {
    val pending = pendingMarker(root)
    f.create(pending, true).close()
    require(f.rename(root, old), s"swap failed: could not move $root aside")
    require(f.rename(tmp, root), s"swap failed: could not move $tmp into place")
    f.delete(old, true)
    f.delete(pending, false)
  }

  /** The versioned-directory swap shared by the in-place maintenance ops
    * (compaction here, stored-index retrain in
    * [[graft.serve.AnnService]]): `tmp` must already hold the COMPLETE
    * replacement. REFUSES to run over an unrecovered crashed swap — the
    * caller derived `tmp` from whatever it read at `root`, and if that
    * read predated recovery the replacement is built from a sparse
    * recreation; callers run [[recoverCrashedSwap]] FIRST (before their
    * reads) and this guard makes skipping that step loud. */
  private[graft] def swapDir(spark: org.apache.spark.sql.SparkSession,
                             root: String, tmp: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t = new org.apache.hadoop.fs.Path(tmp)
    val old = new org.apache.hadoop.fs.Path(root + "-__old__")
    require(!f.exists(pendingMarker(p)),
      s"$root has an unrecovered crashed swap — run " +
        "Sinks.recoverCrashedSwap(root) before reading the layout " +
        "(the maintenance entry points do this; rerun the op)")
    f.delete(old, true)
    doSwap(f, p, t, old)
  }

  /** [[compactParquet]] with the [[compactLayoutInPlace]] versioned-dir
    * swap — the in-place compaction for UNPARTITIONED dataset
    * directories (e.g. a stored RP layout's `root/reduced`, which
    * streaming ingest grows one batch-tagged file at a time). Same crash
    * contract as the partitioned form: the compacted copy is complete
    * before the two-rename swap, so a mid-swap crash leaves a full old
    * or full new directory. */
  def compactParquetInPlace(spark: org.apache.spark.sql.SparkSession,
                            root: String, targetFiles: Int = 1): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(root)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(root + "-__compacting__")
    val old = new org.apache.hadoop.fs.Path(root + "-__old__")
    recoverCrashedSwap(f, p, old) // BEFORE any delete — __old__ may be the only copy
    f.delete(tmp, true) // a crashed previous attempt
    f.delete(old, true)
    compactParquet(spark, root, tmp.toString, targetFiles)
    doSwap(f, p, tmp, old)
    spark.read.parquet(root)
  }

  /** [[compactParquet]] with the file count derived from the ACTUAL bytes
    * on storage — "compact this landing directory to ~128 MB files" with
    * no manual counting, the operational form a nightly compaction job
    * wants. Input size = sum of the source parquet file lengths from the
    * file-system listing (ground truth, not an optimizer row-count
    * estimate, which post-filter selectivity guessing can distort by
    * orders of magnitude); targetFiles = ceil(bytes / targetFileBytes),
    * clamped to [1, maxFiles]. Output files land near the target when the
    * output codec matches the input (the default); a codec change shifts
    * sizes by the compression-ratio delta, not the file count.
    * Returns the re-read compacted frame, like [[compactParquet]]. */
  def compactParquetToSize(spark: org.apache.spark.sql.SparkSession,
                           inPath: String, outPath: String,
                           targetFileBytes: Long = 128L * 1024 * 1024,
                           maxFiles: Int = 100000): DataFrame = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bytesUnder(path: org.apache.hadoop.fs.Path): Long =
      fs.listStatus(path).map { st =>
        val name = st.getPath.getName
        if (name.startsWith("_") || name.startsWith(".")) 0L // metadata/hidden
        else if (st.isDirectory) bytesUnder(st.getPath)
        else st.getLen
      }.sum
    val bytes = bytesUnder(p)
    val targetFiles = math.min(maxFiles.toLong,
      math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)).toInt
    compactParquet(spark, inPath, outPath, targetFiles)
  }

  /** Range-sharded SORTED export — the training-shard layout: rows are
    * range-partitioned on `sortCol` into `shards` files, each file sorted
    * internally, so shard N's key range ends before shard N+1's begins.
    * The layout a data loader wants (deterministic shard → key mapping,
    * sequential reads in key order) and the layout parquet row-group
    * min/max stats prune best (a key-range query touches one shard).
    *
    * Scale mechanics: `repartitionByRange` drives a RangePartitioner
    * whose bounds come from a reservoir SAMPLE of the keys — one extra
    * sampling pass, then one shuffle; shard sizes stay balanced even for
    * skewed key distributions. `sortWithinPartitions` is a partition-local
    * sort — NO additional shuffle, unlike a global `orderBy`. */
  def rangeShardedExport(df: DataFrame, path: String, shards: Int,
                         sortCol: String): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    df.repartitionByRange(shards, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Dynamic partition overwrite — the lake-maintenance primitive for
    * reprocessing a slice (one day, one language, one source) of a
    * partitioned dataset: only the partitions PRESENT IN `df` are
    * replaced; every other partition's files are untouched. Spark's
    * default (static) overwrite mode would first delete the WHOLE
    * dataset — the classic footgun this wrapper exists to avoid — so the
    * mode is scoped to this one write and restored after.
    *
    * At scale this is what makes backfills O(slice) instead of
    * O(dataset): rewriting one bad day of a year-partitioned 100 TB
    * table touches 1/365th of the files, and concurrent readers of other
    * partitions never see a hole. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "overwritePartitions needs partition columns")
    // the PER-WRITE option, not a session-conf mutation: toggling the
    // session key races concurrent writers (another thread's static full
    // refresh would silently become dynamic, and interleaved save/restore
    // pairs corrupt each other's saved values); the write option takes
    // precedence over the session conf and is scoped to this one write
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*).parquet(path)
  }

  /** K2 — emit the CREATE TABLE DDL that the JDBC writer would synthesize
    * (dag1.py:261-270); exposed for inspection/tests. */
  def ddl(df: DataFrame, table: String): String =
    Exprs.schemaToDdl(table, df.schema)

  /** Bucketed, sorted table write — the co-located-join layout: two tables
    * bucketed by the same keys into the same bucket count join WITHOUT a
    * shuffle (plan shows SortMergeJoin with no Exchange). The 100 TB story
    * for repeated fact-to-fact joins on a stable key; see SinksSpec for a
    * plan-level assertion. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty, "writeBucketed needs at least one bucket column")
    require(numBuckets > 0, s"numBuckets must be positive, got $numBuckets")
    var w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }

  /** Drop a managed table AND its warehouse directory. The in-memory
    * catalog forgets tables across JVMs while their directories survive,
    * and a later CREATE then fails with LOCATION_ALREADY_EXISTS — so both
    * must go. */
  def dropManagedTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // mirror the catalog's directory layout: identifiers are stored
    // LOWERCASED, and a db-qualified table lives under <db>.db/<table> —
    // deleting the verbatim name would miss the real directory on a
    // case-sensitive FS and the next CREATE would still hit
    // LOCATION_ALREADY_EXISTS
    val warehouse = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    val rel = table.toLowerCase.split("\\.") match {
      case Array(db, t) => s"$db.db/$t"
      case _            => table.toLowerCase
    }
    val loc = new java.io.File(warehouse, rel)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    if (loc.exists()) rm(loc)
  }

  /** K3 — full-refresh load: overwrite with TRUNCATE-based refresh when the
    * table exists (dag1.py:272-287 does DELETE FROM + COPY; truncate is the
    * set-based equivalent that keeps the DDL). `columnTypes` optionally pins
    * SQL types (e.g. VARCHAR instead of a dialect's default CLOB) — the
    * analog of the reference's explicit dtype→DDL map (dag1.py:216-226). */
  def jdbcFullRefresh(df: DataFrame, url: String, table: String,
                      props: Map[String, String] = Map.empty,
                      columnTypes: Option[String] = None,
                      batchSize: Int = 10000): DataFrame = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    var w = df.write.mode(SaveMode.Overwrite)
      .option("truncate", true)
      .option("batchsize", batchSize)
    columnTypes.foreach(ct => w = w.option("createTableColumnTypes", ct))
    w.jdbc(url, table, p)
    df
  }
}
