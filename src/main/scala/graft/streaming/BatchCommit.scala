package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Replay-safe ("exactly-once in effect") commit protocol for streaming
  * appends into stored index layouts — the machinery that closes the
  * documented at-least-once window of the ingest sinks: `foreachBatch`
  * guarantees a batch is re-delivered WITH THE SAME batchId after a crash,
  * so an append is idempotent iff (a) a fully-committed batch can be
  * recognized and skipped, and (b) a partially-committed batch's files can
  * be found and removed before the redo. Both follow from two rules:
  *
  *   1. every data file a batch adds carries the batch id in its FILE NAME
  *      (`batch-<id>-<original>`), so a replay can scrub a crashed
  *      attempt's leftovers with one listing — no manifest to lose;
  *   2. a ledger marker (`<root>/_ledger/batch-<id>`) is written strictly
  *      AFTER every data file is in place, so marker-present ⇒ batch
  *      fully applied ⇒ skip.
  *
  * Crash anywhere before the marker ⇒ the replay scrubs `batch-<id>-*`
  * and redoes the whole batch; crash after ⇒ the replay skips. Stats or
  * other read-modify-write state must NOT be updated in place under this
  * protocol — write per-batch DELTA rows as batch-tagged files instead and
  * let readers aggregate (the [[graft.serve.SearchService.readStats]]
  * contract).
  *
  * Layout compatibility: files move INTO the existing partition
  * directories (`bucket=X/`, `cell=Y/`), so partition pruning, the batch
  * maintenance ops, and every existing reader see one uniform dataset —
  * no sibling "delta" directory to union in.
  *
  * Scale notes: the per-batch staging write is an ordinary distributed
  * Spark job; only the rename loop runs on the driver and it is O(files
  * in the batch). Renames are metadata-only on HDFS-like stores; on
  * object stores without atomic rename the scrub step still restores
  * correctness after a crashed copy. The scrub listing walks only the
  * target dataset directories (bounded by the layout's partition count ×
  * files — the thing [[graft.io.Sinks.compactLayout]] keeps small). */
object BatchCommit {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def ledgerPath(root: String, batchId: Long): Path =
    new Path(s"$root/_ledger/batch-$batchId")

  /** True iff `batchId` was fully committed under `root` (marker present). */
  def alreadyCommitted(spark: SparkSession, root: String,
                       batchId: Long): Boolean = {
    val p = ledgerPath(root, batchId)
    fs(spark, p).exists(p)
  }

  // the trailing dash matters: "batch-1-" must not match batch-11's files
  private def tag(batchId: Long) = s"batch-$batchId-"

  /** Delete every data file named `batch-<id>-*` under `dir` (recursive) —
    * the leftovers of a crashed attempt at this batch. */
  private def scrub(spark: SparkSession, dir: String, batchId: Long): Unit = {
    val p = new Path(dir)
    val f = fs(spark, p)
    if (f.exists(p)) {
      val it = f.listFiles(p, true)
      val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.startsWith(tag(batchId)))
          doomed += st.getPath
      }
      doomed.foreach(f.delete(_, false))
    }
  }

  /** Move every committed data file under `stagingDir` into `targetDir`,
    * preserving partition subpaths (`bucket=X/part-*.parquet` lands in
    * `targetDir/bucket=X/`) and prefixing names with the batch tag.
    * Returns the DESTINATION paths, so the committer can re-verify them
    * before writing the ledger marker. */
  private def moveIn(spark: SparkSession, stagingDir: String,
                     targetDir: String, batchId: Long): Seq[Path] = {
    val src = new Path(stagingDir)
    val dst = new Path(targetDir)
    val f = fs(spark, src)
    val srcUri = src.toUri.getPath
    val it = f.listFiles(src, true)
    val moved = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        val rel = st.getPath.toUri.getPath.stripPrefix(srcUri).stripPrefix("/")
        val parent = rel.lastIndexOf('/') match {
          case -1 => dst
          case i  => new Path(dst, rel.substring(0, i))
        }
        f.mkdirs(parent)
        val target = new Path(parent, tag(batchId) + name)
        require(f.rename(st.getPath, target),
          s"rename failed moving ${st.getPath} into $parent")
        moved += target
      }
    }
    moved.toSeq
  }

  /** Delete batch-tagged data files whose batch has NO ledger marker —
    * the leftovers of a crashed, not-yet-replayed micro-batch.
    * Maintenance ops that fold a layout's files into UNTAGGED rewrites
    * ([[graft.serve.SearchService.compactIndex]]/`upsertDelta`,
    * [[graft.serve.AnnService.compactIndex]]) MUST call this first:
    * folding an uncommitted batch's partial files would bake them into
    * the layout, and the stream's replay of that batch (same id, no
    * marker, nothing left to scrub) would then re-add every row — a
    * double count with no error surfaced. Dropping the orphans instead
    * loses nothing: the checkpoint still holds the batch's source
    * offsets, so the restarted stream redoes it in full. Committed
    * batches (marker present) are untouched — their replays skip by
    * marker, not by file presence. */
  def scrubUncommitted(spark: SparkSession, root: String,
                       dataDirs: Seq[String]): Unit = {
    val lp = new Path(s"$root/_ledger")
    val f = fs(spark, lp)
    // QUIESCENCE GATE: a `_staging/batch-*` dir means a stream is
    // mid-commit (files being staged or moved in) or crashed and not yet
    // replayed. Scrubbing now cannot distinguish that batch's files from
    // crashed orphans — deleting them mid-move-in would race the live
    // stream (runOnce's pre-marker re-verification turns that race into
    // a clean batch retry, but a maintenance rewrite folding the layout
    // at the same time could still lose the batch). Refuse loudly; run
    // maintenance when the stream is quiescent, or restart a crashed
    // stream so its replay cleans up first.
    val staging = new Path(s"$root/_staging")
    if (f.exists(staging)) {
      val active = f.listStatus(staging)
        .filter(_.getPath.getName.startsWith("batch-"))
      require(active.isEmpty,
        s"refusing to scrub $root: staged batch dir(s) " +
          s"${active.map(_.getPath.getName).mkString(", ")} exist — a " +
          "stream is mid-commit (or crashed and not yet replayed); " +
          "quiesce or restart the stream before running maintenance")
    }
    val committed: Set[String] =
      if (f.exists(lp)) f.listStatus(lp).map(_.getPath.getName).toSet
      else Set.empty
    val Tagged = "(batch-\\d+)-.*".r
    dataDirs.foreach { dir =>
      val p = new Path(dir)
      if (f.exists(p)) {
        val it = f.listFiles(p, true)
        val doomed = scala.collection.mutable.ArrayBuffer.empty[Path]
        while (it.hasNext) {
          val st = it.next()
          st.getPath.getName match {
            case Tagged(marker) if st.isFile && !committed.contains(marker) =>
              doomed += st.getPath
            case _ => ()
          }
        }
        doomed.foreach(f.delete(_, false))
      }
    }
  }

  /** Run one batch's append EXACTLY ONCE IN EFFECT. `writeStaged` writes
    * the batch's output dataset(s) under the supplied staging directory
    * and returns (stagedSubdir → targetDir) pairs; this method then
    * scrubs any crashed attempt's files, moves the staged files into the
    * live layout under batch-tagged names, and writes the ledger marker
    * last. Returns false when the batch was already committed (replay
    * after a post-marker crash) and nothing was done. */
  def runOnce(spark: SparkSession, root: String, batchId: Long)
             (writeStaged: String => Seq[(String, String)]): Boolean = {
    if (alreadyCommitted(spark, root, batchId)) return false
    val staging = s"$root/_staging/batch-$batchId"
    val stagingPath = new Path(staging)
    val f = fs(spark, stagingPath)
    f.delete(stagingPath, true) // a crashed attempt's staging leftovers
    val moves = writeStaged(staging)
    moves.foreach { case (_, target) => scrub(spark, target, batchId) }
    val landed = moves.flatMap { case (staged, target) =>
      moveIn(spark, staged, target, batchId) }
    // PRE-MARKER RE-VERIFICATION: a concurrent [[scrubUncommitted]] (a
    // maintenance op racing this stream past the quiescence gate) sees
    // this batch's moved-in files as marker-less orphans and deletes
    // them. Writing the marker anyway would record a committed batch
    // whose rows are gone — the replay skips by marker and the data is
    // silently lost forever. Verify every moved file still exists and
    // FAIL the batch instead: the checkpoint has not advanced, so the
    // stream retries the batch from its source offsets and loses nothing.
    landed.filterNot(f.exists) match {
      case Seq() => ()
      case gone => throw new IllegalStateException(
        s"batch $batchId under $root lost ${gone.size} moved file(s) " +
          s"before its ledger marker (first: ${gone.head}) — a concurrent " +
          "maintenance scrub deleted them; failing the batch so the " +
          "stream replays it. Do not run index maintenance against a " +
          "root with an active ingest stream.")
    }
    val marker = ledgerPath(root, batchId)
    f.mkdirs(marker.getParent)
    val out = f.create(marker, true)
    out.close()
    f.delete(stagingPath, true)
    true
  }

  /** Assert (and on first use record) the ONE-CHECKPOINT-PER-ROOT
    * invariant the ledger's batch-id keying stands on: `foreachBatch`
    * batch ids are unique and replay-stable only WITHIN one checkpoint
    * lineage. A stream restarted with a fresh checkpoint dir — or a
    * second stream into the same root — restarts ids at 0, and the old
    * markers would silently SKIP genuinely new batches (data loss, no
    * error). Every ingest-stream constructor calls this before
    * `start()`: the first stream stamps its qualified checkpoint path
    * under `_ledger/`; any later stream with a different path fails
    * loudly. To re-point a layout at a new checkpoint deliberately,
    * clear `_ledger/` (markers AND stamp) together — the fresh lineage
    * then starts from an empty ledger, which is consistent. */
  def assertStreamIdentity(spark: SparkSession, root: String,
                           checkpointDir: String): Unit = {
    val stamp = new Path(s"$root/_ledger/_checkpoint")
    val f = fs(spark, stamp)
    val qualified = f.makeQualified(new Path(checkpointDir)).toString
    if (f.exists(stamp)) {
      val in = f.open(stamp)
      val recorded = try {
        scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      } finally in.close()
      require(recorded == qualified,
        s"ledger markers under $root belong to checkpoint $recorded; " +
          s"starting a stream with checkpoint $qualified would replay " +
          "batch ids against the wrong lineage and silently skip new " +
          "batches — reuse the original checkpoint, or clear _ledger/ " +
          "to adopt the new one")
    } else {
      f.mkdirs(stamp.getParent)
      val out = f.create(stamp, true)
      try out.write(qualified.getBytes("UTF-8")) finally out.close()
    }
  }
}
