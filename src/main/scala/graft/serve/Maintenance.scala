package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The nightly maintenance job, as ONE composed call per stored index
  * family — the entry point every lifecycle scaladoc in this repo
  * gestures at ("the call a nightly maintenance job makes
  * unconditionally"), with the ordering knowledge baked in so an
  * operator cannot get it wrong:
  *
  *   1. uncommitted-batch orphans are scrubbed (inside each op — a
  *      crashed micro-batch's files must never be folded into an
  *      untagged rewrite, or its replay double-counts);
  *   2. the family's health trigger decides a RETRAIN migration
  *      (occupancy skew for cell-partitioned tiers, reconstruction
  *      distortion for the flat-PQ tier; RP's projection is
  *      (dimOut, seed)-defined — nothing trains, so nothing drifts —
  *      and BM25's postings have no quantizer at all);
  *   3. compaction runs ONLY when no migration happened: the retrain
  *      migrations write cell-repartitioned layouts, so a migrated
  *      index is already one-file-per-cell and a second full rewrite
  *      would be pure waste — at 100 TB, skipping it is the point.
  *
  * Each method returns whether a retrain migration happened (false ⇒
  * the layout was compacted instead). Thresholds deliberately have NO
  * defaults hidden here beyond the underlying ops' — the nightly job is
  * where an operator states their policy. */
object Maintenance {

  /** Flat IVF layout (`root/centroids` + `root/assigned`):
    * retrain-if-skewed, else compact. */
  def nightlyIvf(spark: SparkSession, root: String,
                 maxBalance: Double = 2.0,
                 nlist: Int = 8, stride: Int = 29,
                 filesPerPartition: Int = 1): Boolean = {
    val retrained = AnnService.retrainIndexIfSkewed(spark, root,
      maxBalance, nlist, stride)
    if (!retrained) AnnService.compactIndex(spark, root, filesPerPartition)
    retrained
  }

  /** Residual IVF-PQ layout (`root/centroids` + `root/codebooks` +
    * `root/codes`): retrain when EITHER health signal fires (occupancy
    * skew, or — when `maxMeanSse` is finite — codebook distortion
    * against the raw store), else compact. */
  def nightlyIvfPq(spark: SparkSession, root: String, rawStore: DataFrame,
                   maxBalance: Double = 2.0,
                   maxMeanSse: Double = Double.MaxValue,
                   nlist: Int = 16, m: Int = 4, codebookSize: Int = 16,
                   seed: Long = 42L,
                   filesPerPartition: Int = 1): Boolean = {
    val retrained = AnnPqService.retrainIndexIfUnhealthy(spark, root,
      rawStore, maxBalance, maxMeanSse, nlist, m, codebookSize, seed)
    if (!retrained) AnnPqService.compactIndex(spark, root, filesPerPartition)
    retrained
  }

  /** Flat-PQ layout (`root/codebooks` + `root/codes`): retrain when the
    * mean reconstruction error exceeds `maxMeanSse`, then compact
    * either way — the flat code frame is unpartitioned and the
    * migration write keeps the encode plan's partitioning, so the fold
    * is useful even after a retrain. */
  def nightlyPq(spark: SparkSession, root: String, rawStore: DataFrame,
                maxMeanSse: Double,
                m: Int = 4, codebookSize: Int = 16, seed: Long = 42L,
                targetFiles: Int = 1): Boolean = {
    val retrained = AnnFlatPqService.retrainIndexIfDistorted(spark, root,
      rawStore, maxMeanSse, m, codebookSize, seed)
    AnnFlatPqService.compactIndex(spark, root, targetFiles)
    retrained
  }

  /** RP layout (`root/reduced`): compaction only — the projection is
    * identified by (dimOut, seed), nothing is trained, so there is no
    * quantizer to drift and no retrain to trigger. Always returns
    * false. */
  def nightlyRp(spark: SparkSession, root: String,
                targetFiles: Int = 1): Boolean = {
    AnnRpService.compactIndex(spark, root, targetFiles)
    false
  }

  /** SQ8 layout (`root/quantized`): compaction only — per-vector scales
    * mean NOTHING trained exists to drift ([[graft.sim.Sq]] scaladoc),
    * so like RP the nightly job is scrub + small-file fold. Always
    * returns false (no migration can happen). */
  def nightlySq(spark: SparkSession, root: String,
                targetFiles: Int = 1): Boolean = {
    AnnSqService.compactIndex(spark, root, targetFiles)
    false
  }

  /** BM25 layout (`root/postings` + `root/stats`): compaction only —
    * postings carry no quantizer; the streamed per-batch stats deltas
    * fold to one row and term buckets fold to `filesPerPartition`
    * files. Always returns false. */
  def nightlyBm25(spark: SparkSession, root: String,
                  filesPerPartition: Int = 1): Boolean = {
    SearchService.compactIndex(spark, root, filesPerPartition)
    false
  }

  /** Stored graph-ranks layout (`root/ranks`): rank is a GLOBAL fixed
    * point of the edge set — there is no per-edge delta to fold and no
    * quantizer to drift — so the nightly unit IS the full recompute +
    * marker-fenced swap ([[GraphRankService.refreshPageRank]]), from
    * whatever the current edge frame is. Always returns false (the
    * rebuild is the maintenance; nothing further can migrate). */
  def nightlyGraph(spark: SparkSession, root: String, edges: DataFrame,
                   srcCol: String, dstCol: String, iterations: Int = 5,
                   weightCol: Option[String] = None,
                   seeds: Option[(DataFrame, String)] = None): Boolean = {
    GraphRankService.refreshPageRank(spark, root, edges, srcCol, dstCol,
      iterations, weightCol = weightCol, seeds = seeds)
    false
  }

  /** Stored triangle-stats layout (`root/triangles`): triangle counts
    * are a global function of the edge set (one edge touches up to
    * deg(u)+deg(v) counts), so like rank the nightly unit is the full
    * O(m^1.5) recompute + marker-fenced swap. Always returns false. */
  def nightlyTriangles(spark: SparkSession, root: String, edges: DataFrame,
                       srcCol: String, dstCol: String): Boolean = {
    GraphRankService.refreshTriangles(spark, root, edges, srcCol, dstCol)
    false
  }

  /** Stored k-core layout (`root/kcore`): core membership is a global
    * fixed point — the nightly unit is the fixpoint peel (`rounds = 0`
    * default) + marker-fenced swap. `maxRounds` is the fixpoint
    * runaway budget, threaded through the whole service chain so a
    * legitimately deep peel cascade (one-node-per-round chains) can be
    * accommodated from the nightly entry point without bypassing the
    * service layer. Always returns false. */
  def nightlyKCore(spark: SparkSession, root: String, edges: DataFrame,
                   srcCol: String, dstCol: String, k: Int,
                   rounds: Int = 0, maxRounds: Int = 64): Boolean = {
    GraphRankService.refreshKCore(spark, root, edges, srcCol, dstCol, k,
      rounds, maxRounds = maxRounds)
    false
  }

  /** Stored community layout (`root/communities`): labels are a global
    * function of the edge set (one bridge edge can merge communities),
    * so the nightly unit is the full propagation + marker-fenced swap.
    * Always returns false. */
  def nightlyCommunities(spark: SparkSession, root: String,
                         edges: DataFrame, srcCol: String, dstCol: String,
                         rounds: Int): Boolean = {
    GraphRankService.refreshCommunities(spark, root, edges, srcCol, dstCol,
      rounds)
    false
  }

  /** Stored DSIR weight layout (`root/weights`): the corpus/target
    * marginals are global (every new document shifts every bucket), so
    * the nightly unit is the full retrain + marker-fenced swap
    * ([[DsirService.refreshWeights]]). Always returns false — the
    * retrain IS the maintenance. */
  def nightlyDsir(spark: SparkSession, root: String, raw: DataFrame,
                  target: DataFrame, textCol: String, idCol: String,
                  buckets: Int = 1024): Boolean = {
    DsirService.refreshWeights(spark, root, raw, target, textCol, idCol,
      buckets)
    false
  }

  /** STREAMED DSIR weight layout (`root/target` + `root/raw` deltas +
    * `root/weights`): uncommitted-batch orphans are scrubbed first (a
    * crashed micro-batch's delta files must never fold into the
    * marginal — [[graft.streaming.BatchCommit.scrubUncommitted]]'s
    * quiescence gate makes a live stream refuse loudly), then the
    * serving weight table re-derives from the summed marginals in
    * O(buckets) ([[DsirService.recomputeWeights]]) — no corpus rescan.
    * Always returns false (nothing trains, nothing can migrate). */
  def nightlyDsirFold(spark: SparkSession, root: String): Boolean = {
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/raw"))
    DsirService.recomputeWeights(spark, root)
    false
  }

  /** STREAMED rolling-quantile sketch layout (`root/meta` +
    * `root/hourly` base + per-micro-batch deltas): uncommitted-batch
    * orphans are scrubbed first (the quiescence-gated
    * [[graft.streaming.BatchCommit.scrubUncommitted]] — a live stream
    * refuses loudly), then the per-(hour, type) sketch rows fold back
    * to one row each ([[RollingQuantileService.compactHourly]] —
    * KLL merge IS the fold, marker-fenced swap). Sketch-row
    * arithmetic, never an event rescan. Always returns false (nothing
    * trains — k is the layout identity — so nothing can migrate). */
  def nightlyRollingQuantiles(spark: SparkSession, root: String,
                              numFiles: Int = 1): Boolean = {
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/hourly"))
    RollingQuantileService.compactHourly(spark, root, numFiles)
    false
  }

  /** STREAMED bigram-LM model layout (`root/bigrams` + `root/words`
    * bases + per-micro-batch deltas): uncommitted-batch orphans are
    * scrubbed first, then both count tables fold back to one row per
    * key ([[LmService.compactModel]] — integer addition IS the fold,
    * marker-fenced swaps). Model-sized arithmetic, never a corpus
    * rescan. Always returns false (counts are the model; nothing can
    * migrate). */
  def nightlyLmFold(spark: SparkSession, root: String,
                    numFiles: Int = 1): Boolean = {
    graft.streaming.BatchCommit.scrubUncommitted(spark, root,
      Seq(s"$root/bigrams", s"$root/words"))
    // health invariant around the fold: integer-sum folding is
    // key-preserving, so the folded vocabulary size must equal the
    // reader-side folded size measured before — a collapse here means
    // lost model keys and must fail the nightly, not the next scoring
    // request. vocabSize is memoized per service instance, so each side
    // of the invariant is exactly ONE model-sized count. The invariant
    // is valid under the SAME quiescence contract every maintenance op
    // here already demands (scrubUncommitted refuses a mid-commit
    // stream, and a live stream racing the fold could lose a delta to
    // the swap regardless) — a batch committed between the two reads
    // would trip this require, which is the contract violation
    // surfacing, not a false alarm.
    val before = LmService.overParquetDir(spark, root).vocabSize
    LmService.compactModel(spark, root, numFiles)
    val after = LmService.overParquetDir(spark, root).vocabSize
    require(after == before,
      s"LM fold changed the vocabulary size ($before -> $after) — the " +
        "groupBy-sum fold must be key-preserving; the layout may be " +
        "corrupt, investigate before serving")
    false
  }

  /** Near-dup signature layout (`root/signatures` + `root/buckets`):
    * compaction only — the banding parameters are the index identity
    * (like RP's (dimOut, seed)), nothing is trained, so there is no
    * quantizer to drift; the health number a nightly job should still
    * read is [[NearDupService.bucketStats]]' worst occupancy, whose
    * remedy is corpus hygiene (exact-dedup before ingest), not a
    * migration. Always returns false. */
  def nightlyNearDup(spark: SparkSession, root: String,
                     filesPerPartition: Int = 1): Boolean = {
    NearDupService.compactIndex(spark, root, filesPerPartition)
    false
  }
}
