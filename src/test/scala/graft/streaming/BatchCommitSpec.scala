package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The commit protocol's defensive seams: the maintenance-vs-live-stream
  * quiescence gate, and the one-checkpoint-per-root ledger identity.
  * (Replay semantics — kill-and-replay, skip-by-marker — are pinned in
  * StreamOpsSpec against the real ingest sinks.) */
class BatchCommitSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("scrubUncommitted refuses while a staged batch dir exists (quiescence gate)") {
    val root = tmp("graft_bc_gate")
    // a committed batch, so the ledger exists
    BatchCommit.runOnce(spark, root, 0L) { staging =>
      Seq((1, "a")).toDF("id", "v").write.parquet(s"$staging/data")
      Seq(s"$staging/data" -> s"$root/data")
    }
    // simulate a stream mid-commit (or crashed before replay): a staged
    // batch directory is present
    new java.io.File(s"$root/_staging/batch-7").mkdirs()
    val e = intercept[IllegalArgumentException] {
      BatchCommit.scrubUncommitted(spark, root, Seq(s"$root/data"))
    }
    assert(e.getMessage.contains("batch-7"))
    // gate clears with the staging dir
    new java.io.File(s"$root/_staging/batch-7").delete()
    BatchCommit.scrubUncommitted(spark, root, Seq(s"$root/data"))
    assert(spark.read.parquet(s"$root/data").count() === 1L)
  }

  test("scrubUncommitted still removes marker-less orphans when quiescent") {
    val root = tmp("graft_bc_scrub")
    BatchCommit.runOnce(spark, root, 0L) { staging =>
      Seq((1, "a")).toDF("id", "v").write.parquet(s"$staging/data")
      Seq(s"$staging/data" -> s"$root/data")
    }
    // forge a crashed batch's leftover: tagged file, no marker
    val orphan = new java.io.File(s"$root/data/batch-9-orphan.parquet")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    BatchCommit.scrubUncommitted(spark, root, Seq(s"$root/data"))
    assert(!orphan.exists(), "marker-less batch-tagged file must be scrubbed")
    assert(spark.read.parquet(s"$root/data").count() === 1L,
      "committed batch untouched")
  }

  test("assertStreamIdentity stamps the first checkpoint and rejects a different one") {
    val root = tmp("graft_bc_ident")
    val ckpt = tmp("graft_bc_ckpt")
    BatchCommit.assertStreamIdentity(spark, root, ckpt)
    // same checkpoint: idempotent
    BatchCommit.assertStreamIdentity(spark, root, ckpt)
    // a different checkpoint restarts batch ids at 0 against this root's
    // markers — must fail loudly instead of silently skipping new batches
    val other = tmp("graft_bc_ckpt2")
    val e = intercept[IllegalArgumentException] {
      BatchCommit.assertStreamIdentity(spark, root, other)
    }
    assert(e.getMessage.contains("checkpoint"))
    // the stamp must not be mistaken for a batch marker
    assert(!BatchCommit.alreadyCommitted(spark, root, 0L))
  }
}
