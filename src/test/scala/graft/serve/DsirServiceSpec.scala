package graft.serve

import graft.SparkSpec
import graft.text.TextOps

/** Stored DSIR weight tier: build / open / score / refresh, and the
  * nightly composition. The core contract — stored-weight scoring
  * replays the full-recompute faces bit-for-bit — is what makes the
  * driver's txt_dsir_probe face hash-green. */
class DsirServiceSpec extends SparkSpec {
  import spark.implicits._

  private val tgtVocab = "cat dog pet paw fur tail whisker collar leash bone"
  private val offVocab = "bond yield swap rate hedge margin equity basis tenor spread"

  private def corpus = (
    (0L until 10L).map(i => (i, tgtVocab)) ++
    (10L until 20L).map(i => (i, offVocab)) ++
    Seq((20L, ""))
  ).toDF("doc_id", "text")

  private def target = (0L until 5L).map(i => (i, tgtVocab))
    .toDF("doc_id", "text")

  test("buildWeights + overParquetDir: scoring the training corpus " +
      "replays dsirStats bit-for-bit; buckets recovered from the layout") {
    val root = java.nio.file.Files.createTempDirectory("dsir_srv_").toString
    DsirService.buildWeights(corpus, target, "text", "doc_id", root,
      buckets = 64)
    val svc = DsirService.overParquetDir(spark, root)
    assert(svc.buckets === 64, "dense spine row count IS the bucket count")
    val stored = svc.scoreStats(corpus, "text", "doc_id")
      .as[(Long, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().sortBy(_._1).toSeq
    val direct = TextOps.dsirStats(corpus, target, "text", "doc_id",
        buckets = 64)
      .as[(Long, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().sortBy(_._1).toSeq
    assert(stored === direct)
    // featureless doc: all-zero row, present
    assert(stored.find(_._1 == 20L).get ===
      ((20L, 0L, BigDecimal(0), BigDecimal(0), BigDecimal(0))))
  }

  test("scoring a NEW batch is per-doc local: subset scores equal the " +
      "full-corpus scores for those docs; ln weights replay dsirWeights") {
    val root = java.nio.file.Files.createTempDirectory("dsir_srv2_").toString
    DsirService.buildWeights(corpus, target, "text", "doc_id", root,
      buckets = 64)
    val svc = DsirService.overParquetDir(spark, root)
    val batch = corpus.filter($"doc_id" % 3 === 0)
    val sub = svc.scoreStats(batch, "text", "doc_id")
      .as[(Long, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().sortBy(_._1).toSeq
    val full = svc.scoreStats(corpus, "text", "doc_id")
      .as[(Long, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().filter(_._1 % 3 == 0).sortBy(_._1).toSeq
    assert(sub === full, "scores depend only on the doc and the weights")
    // an unseen doc scores through the same stored buckets — margin sign
    // separates target-like from off-target
    val unseen = Seq((100L, tgtVocab), (101L, offVocab))
      .toDF("doc_id", "text")
    val got = svc.scoreStats(unseen, "text", "doc_id")
      .as[(Long, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().map(r => r._1 -> r._5).toMap
    assert(got(100L) > got(101L),
      "target-like unseen doc must out-margin the off-target one")
    val lnStored = svc.scoreWeights(corpus, "text", "doc_id")
      .as[(Long, Long, BigDecimal)].collect().sortBy(_._1).toSeq
    val lnDirect = TextOps.dsirWeights(corpus, target, "text", "doc_id",
        buckets = 64)
      .as[(Long, Long, BigDecimal)].collect().sortBy(_._1).toSeq
    assert(lnStored === lnDirect,
      "stored round-6 log-ratios replay the ln-weight face exactly")
  }

  test("refreshWeights swaps to a retrain on the new target; " +
      "nightlyDsir composes it") {
    val root = java.nio.file.Files.createTempDirectory("dsir_srv3_").toString
    DsirService.buildWeights(corpus, target, "text", "doc_id", root,
      buckets = 64)
    val before = DsirService.overParquetDir(spark, root)
      .scoreStats(corpus, "text", "doc_id")
      .as[(Long, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().map(r => r._1 -> r._5).toMap
    // the target flips to the off-vocab docs — margins must flip order
    val flipped = (10L until 15L).map(i => (i, offVocab))
      .toDF("doc_id", "text")
    assert(!Maintenance.nightlyDsir(spark, root, corpus, flipped,
      "text", "doc_id", buckets = 64))
    val after = DsirService.overParquetDir(spark, root)
      .scoreStats(corpus, "text", "doc_id")
      .as[(Long, Long, BigDecimal, BigDecimal, BigDecimal)]
      .collect().map(r => r._1 -> r._5).toMap
    assert(before(0L) > before(10L) && after(10L) > after(0L),
      "retrained weights must re-rank toward the new target")
  }
}
