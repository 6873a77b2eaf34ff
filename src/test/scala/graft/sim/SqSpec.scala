package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Int8 scalar quantization (SQ8) — stored tier + lifecycle. */
class SqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def vec(i: Int): Array[Float] = {
    val rnd = new scala.util.Random(i)
    Array.fill(dim)(rnd.nextGaussian().toFloat)
  }
  private def corpus = (0 until 40).map(i => (i.toLong, vec(i)))
    .toDF("vec_id", "embedding")

  // Row.toString renders binary columns by ARRAY IDENTITY — compare the
  // code bytes as hex so equality is by content
  private def qRows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.withColumn("__qh", hex(col("q"))).drop("q")
      .collect().map(_.toString).toSet

  test("probeTopK over a built index ≡ quantizedTopK (same symmetric " +
      "arithmetic, one quantization at rest)") {
    val q = corpus.filter(col("vec_id") < 5)
    val viaIndex = Sq.probeTopK(Sq.buildIndex(corpus), q, k = 3)
      .collect().map(_.toString).toSet
    val direct = Similarity.quantizedTopK(corpus, q, k = 3)
      .collect().map(_.toString).toSet
    assert(viaIndex === direct)
  }

  test("stored layout (parquet round-trip) probes identically to in-memory") {
    val root = java.nio.file.Files.createTempDirectory("sq_idx_").toString
    Sq.buildIndex(corpus).quantized.write.parquet(s"$root/quantized")
    val q = corpus.filter(col("vec_id") < 5)
    val stored = Sq.probeTopK(
        SqIndex(spark.read.parquet(s"$root/quantized")), q, k = 3)
      .collect().map(_.toString).toSet
    val mem = Sq.probeTopK(Sq.buildIndex(corpus), q, k = 3)
      .collect().map(_.toString).toSet
    assert(stored === mem)
  }

  test("probeTopK rejects wrong-width queries loudly (dotI8 would " +
      "silently dot the common prefix)") {
    val narrow = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Sq.probeTopK(Sq.buildIndex(corpus), narrow, k = 3)
    }
    assert(ex.getMessage.contains("dims"))
  }

  test("probeTopK with knownDim (caller pre-validated) ≡ the probed path") {
    val q = corpus.filter(col("vec_id") < 5)
    val probed = Sq.probeTopK(Sq.buildIndex(corpus), q, k = 3)
      .collect().map(_.toString).toSet
    val preValidated = Sq.probeTopK(Sq.buildIndex(corpus), q, k = 3,
        knownDim = Some(dim))
      .collect().map(_.toString).toSet
    assert(preValidated === probed)
  }

  test("append ≡ rebuild EXACTLY (per-vector scales — no frozen artifact)") {
    val base = Sq.buildIndex(corpus.filter(col("vec_id") < 25))
    val merged = Sq.appendToIndex(base, corpus.filter(col("vec_id") >= 25))
    val rebuilt = Sq.buildIndex(corpus)
    assert(qRows(merged.quantized) === qRows(rebuilt.quantized))
  }

  test("remove ≡ rebuild on the remainder; filtered probe keeps k " +
      "MATCHING survivors") {
    val removed = corpus.filter(col("vec_id") % 5 === 0).select("vec_id")
    val after = Sq.removeFromIndex(Sq.buildIndex(corpus), removed)
    val rebuilt = Sq.buildIndex(corpus.filter(col("vec_id") % 5 =!= 0))
    assert(qRows(after.quantized) === qRows(rebuilt.quantized))

    val tagged = corpus.withColumn("tag",
      pmod(col("vec_id"), lit(2L)).cast("int"))
    val idx = Sq.buildIndex(tagged, keepCols = Seq("tag"))
    val got = Sq.probeTopK(idx, corpus.filter(col("vec_id") === 1), k = 4,
        filter = Some(col("tag") === 0))
      .select("cand_id").as[Long].collect().toSet
    assert(got.size === 4 && got.forall(_ % 2 == 0),
      s"k survivors must all match the predicate: $got")
  }

  test("AnnSqService: golden identical-vector probe, guards, takedown, " +
      "upsert ≡ rebuild") {
    val root = java.nio.file.Files.createTempDirectory("sq_srv_").toString
    val withDup = corpus.unionByName(
      Seq((9007L, vec(7))).toDF("vec_id", "embedding"))
    Sq.buildIndex(withDup).quantized.write.parquet(s"$root/quantized")
    val svc = graft.serve.AnnSqService.overParquetDir(spark, root, maxK = 10)
    assert(svc.dim === dim)
    // identical gaussian vectors dominate the inner-product ranking
    val hit = svc.topK(vec(7).toIndexedSeq, 2)
    assert(hit.map(_._1).toSet === Set(7L, 9007L), hit.toString)
    assert(hit.map(_._3) === Seq(1, 2))
    intercept[IllegalArgumentException] { svc.topK(Seq(1.0f), 2) }
    intercept[IllegalArgumentException] { svc.topK(vec(7).toIndexedSeq, 0) }
    intercept[IllegalArgumentException] {
      svc.topK(vec(7).toIndexedSeq, 2, Some("tag" -> "1"))
    }

    // takedown: the duplicate disappears from serving; layout ≡ remainder
    graft.serve.AnnSqService.removeFromIndex(spark, root,
      Seq(9007L).toDF("vec_id"))
    val svc2 = graft.serve.AnnSqService.overParquetDir(spark, root, maxK = 10)
    assert(!svc2.topK(vec(7).toIndexedSeq, 3).map(_._1).contains(9007L))
    assert(qRows(spark.read.parquet(s"$root/quantized")) ===
      qRows(Sq.buildIndex(corpus).quantized))

    // upsert: vec 3 re-embeds as vec(999); layout ≡ rebuild on the
    // edited corpus (per-vector quantization — exact equality)
    graft.serve.AnnSqService.upsertDelta(spark, root,
      Seq((3L, vec(999))).toDF("vec_id", "embedding"))
    val edited = corpus.filter(col("vec_id") =!= 3).unionByName(
      Seq((3L, vec(999))).toDF("vec_id", "embedding"))
    assert(qRows(spark.read.parquet(s"$root/quantized")) ===
      qRows(Sq.buildIndex(edited).quantized))
    // duplicate-id upsert batches are rejected
    intercept[IllegalArgumentException] {
      graft.serve.AnnSqService.upsertDelta(spark, root,
        Seq((4L, vec(4)), (4L, vec(5))).toDF("vec_id", "embedding"))
    }
  }

  test("compactIndex folds small files; probes unchanged") {
    val root = java.nio.file.Files.createTempDirectory("sq_cmp_").toString
    // three appends = three+ files
    Seq(0, 1, 2).foreach { s =>
      Sq.quantize(corpus.filter(col("vec_id") % 3 === s))
        .write.mode("append").parquet(s"$root/quantized")
    }
    val before = graft.serve.AnnSqService
      .overParquetDir(spark, root, maxK = 10).topK(vec(7).toIndexedSeq, 3)
    def files() = new java.io.File(s"$root/quantized").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    val nb = files()
    graft.serve.AnnSqService.compactIndex(spark, root)
    assert(files() < nb)
    val after = graft.serve.AnnSqService
      .overParquetDir(spark, root, maxK = 10).topK(vec(7).toIndexedSeq, 3)
    assert(after === before)
  }
}
