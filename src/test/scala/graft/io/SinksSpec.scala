package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("overwritePartitions replaces only the partitions present in the new frame") {
    val out = java.nio.file.Files.createTempDirectory("graft_dynpart").toString
    val full = Seq((1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40))
      .toDF("id", "p", "v")
    full.write.partitionBy("p").parquet(s"$out/t")
    Sinks.overwritePartitions(Seq((9, "b", 99)).toDF("id", "p", "v"),
      s"$out/t", Seq("p"))
    val back = spark.read.parquet(s"$out/t")
      .select("id", "p", "v").as[(Int, String, Int)].collect().toSet
    // partition b fully replaced; a and c untouched
    assert(back === Set((1, "a", 10), (2, "a", 20), (9, "b", 99), (4, "c", 40)))
    // the session-level overwrite mode is restored after the write
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
      .equalsIgnoreCase("static"))
  }

  test("bucketed tables join without a shuffle (co-located SortMergeJoin)") {
    Seq("graft_bkt_a", "graft_bkt_b").foreach(Sinks.dropManagedTable(spark, _))
    val n = 10000
    val facts = (1 to n).map(i => (i % 500, i.toDouble)).toDF("k", "x")
    val other = (1 to n).map(i => (i % 500, s"s$i")).toDF("k", "s")
    Sinks.writeBucketed(facts, "graft_bkt_a", Seq("k"), 8, Seq("k"))
    Sinks.writeBucketed(other, "graft_bkt_b", Seq("k"), 8, Seq("k"))
    val joined = spark.sql(
      """SELECT /*+ MERGE(a) */ a.k, a.x, b.s
        |FROM graft_bkt_a a JOIN graft_bkt_b b ON a.k = b.k""".stripMargin)
    // Materialize THIS Dataset's queryExecution first: count() builds a
    // separate groupBy().count() execution and would leave joined's own
    // adaptive plan un-executed (the no-shuffle walk would then inspect
    // the initial plan, missing runtime-introduced exchanges).
    assert(joined.collect().length === n * (n / 500))
    val nodes = allPlanNodes(joined.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]),
      s"expected SortMergeJoin; plan nodes: ${nodes.map(_.nodeName).distinct}")
    val exchanges = nodes.filter(_.isInstanceOf[Exchange])
    assert(exchanges.isEmpty,
      s"bucketed join should not shuffle; found: ${exchanges.map(_.nodeName)}")
  }

  test("compactParquet: many small files become targetFiles, rows identical") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact_out").toString
    // the streaming-writer pathology: 32 tiny part-files
    (0L until 1000L).toDF("v").repartition(32).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(in)
    def partFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    assert(partFiles(in) === 32)
    val compacted = Sinks.compactParquet(spark, in, out, targetFiles = 4)
    assert(partFiles(out) === 4)
    assert(compacted.as[Long].collect().sorted.sameElements(0L until 1000L))
  }

  test("compactParquetToSize: file count from actual bytes, clamped, rows identical") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("graft_csize_in").toString
    val out1 = java.nio.file.Files.createTempDirectory("graft_csize_out1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_csize_out2").toString
    (0L until 2000L).map(i => (i, s"payload_$i")).toDF("v", "s")
      .repartition(16).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(in)
    def partFiles(dir: String) =
      new java.io.File(dir).listFiles().count(_.getName.startsWith("part-"))
    val inBytes = new java.io.File(in).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.length).sum
    // target a third of the input → ceil gives 3-4 files
    val c1 = Sinks.compactParquetToSize(spark, in, out1, targetFileBytes = inBytes / 3)
    assert(partFiles(out1) === 3 || partFiles(out1) === 4, s"got ${partFiles(out1)}")
    assert(c1.count() === 2000)
    // target far above the input → exactly one file; maxFiles clamps too
    val c2 = Sinks.compactParquetToSize(spark, in, out2,
      targetFileBytes = inBytes * 100)
    assert(partFiles(out2) === 1)
    assert(c2.as[(Long, String)].collect().map(_._1).sorted
      .sameElements(0L until 2000L))
    intercept[IllegalArgumentException] {
      Sinks.compactParquetToSize(spark, in, out2, targetFileBytes = 0)
    }
  }

  test("compactParquet refuses a partitioned layout instead of silently " +
      "unpartitioning it") {
    val in = java.nio.file.Files.createTempDirectory("graft_guard_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_guard_out").toString
    Seq((1L, 0), (2L, 1), (3L, 0)).toDF("v", "bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(in)
    val e = intercept[IllegalArgumentException] {
      Sinks.compactParquet(spark, in, out, targetFiles = 1)
    }
    assert(e.getMessage.contains("compactLayout"), e.getMessage)
  }

  test("compactLayout: small files fold to filesPerPartition per value, " +
      "partition dirs and pruning survive, rows identical") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    val in = java.nio.file.Files.createTempDirectory("graft_clay_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_clay_out").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_clay_out2").toString
    // the streamed-index pathology: 8 small files inside each bucket dir
    val rows = (0 until 400).map(i => (i.toLong, s"t$i", i % 4))
    rows.toDF("id", "t", "bucket").repartition(8)
      .write.mode("overwrite").partitionBy("bucket").parquet(in)
    def filesPer(dir: String): Map[String, Int] =
      new java.io.File(dir).listFiles().filter(_.getName.contains("="))
        .map(d => d.getName ->
          d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    assert(filesPer(in).values.forall(_ > 1), filesPer(in).toString)
    val compacted = Sinks.compactLayout(spark, in, out, Seq("bucket"))
    assert(filesPer(out).keySet === Set("bucket=0", "bucket=1", "bucket=2",
      "bucket=3"))
    assert(filesPer(out).values.forall(_ === 1), filesPer(out).toString)
    assert(compacted.select("id", "t", "bucket")
        .as[(Long, String, Int)].collect().toSet === rows.toSet)
    // pruning plan audit over the COMPACTED layout: the partition
    // predicate must still be a directory filter, not a per-row filter
    val q = spark.read.parquet(out).filter(col("bucket") === 2).select("id")
    q.collect()
    val scans = allPlanNodes(q.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.head.partitionFilters
        .exists(_.references.exists(_.name == "bucket")),
      s"pruning lost post-compaction: ${scans.head.partitionFilters}")
    // skew-relief knob: filesPerPartition = 2 splits each value's rows
    // across UP TO two files/tasks (deterministic content-hash salt; two
    // salt groups of one value can still hash-collide onto one task, so
    // ≤ is the contract — but with 8 (value, salt) combos over 32 tasks
    // at least one value must actually split)
    Sinks.compactLayout(spark, in, out2, Seq("bucket"), filesPerPartition = 2)
    assert(filesPer(out2).values.forall(n => n >= 1 && n <= 2),
      filesPer(out2).toString)
    assert(filesPer(out2).values.exists(_ === 2), filesPer(out2).toString)
    assert(spark.read.parquet(out2).count() === 400)
    intercept[IllegalArgumentException] {
      Sinks.compactLayout(spark, in, out, Seq("nope"))
    }
  }

  test("compactLayoutInPlace: versioned-dir swap leaves the same path " +
      "compacted; scratch dirs cleaned up") {
    val root = java.nio.file.Files.createTempDirectory("graft_swap").toString + "/data"
    val rows = (0 until 200).map(i => (i.toLong, i % 2))
    rows.toDF("id", "p").repartition(6)
      .write.partitionBy("p").parquet(root)
    val before = spark.read.parquet(root).select("id", "p")
      .as[(Long, Int)].collect().toSet
    Sinks.compactLayoutInPlace(spark, root, Seq("p"))
    val after = spark.read.parquet(root).select("id", "p")
      .as[(Long, Int)].collect().toSet
    assert(after === before)
    def filesIn(dir: java.io.File): Int =
      dir.listFiles().count(_.getName.endsWith(".parquet"))
    new java.io.File(root).listFiles().filter(_.getName.contains("=")).foreach(
      d => assert(filesIn(d) === 1, s"${d.getName}: ${filesIn(d)} files"))
    val parent = new java.io.File(root).getParentFile
    assert(parent.listFiles().map(_.getName).toSet === Set("data"),
      parent.listFiles().map(_.getName).mkString(", "))
  }

  test("in-place compaction recovers a crash between the two swap renames " +
      "instead of deleting the only copy") {
    // crashed-mid-swap state: root ABSENT, root-__old__ holds the data,
    // root-__compacting__ holds the crashed attempt's compacted copy —
    // the next run must restore __old__ to root, not delete it
    val base = java.nio.file.Files.createTempDirectory("graft_crash").toString
    val root = s"$base/data"
    val rows = (0 until 100).map(i => (i.toLong, i % 2))
    rows.toDF("id", "p").repartition(5).write.partitionBy("p").parquet(root)
    val before = spark.read.parquet(root).select("id", "p")
      .as[(Long, Int)].collect().toSet
    val f = new java.io.File(root)
    assert(f.renameTo(new java.io.File(s"$root-__old__")))
    new java.io.File(s"$root-__compacting__").mkdirs() // crashed attempt
    val after = Sinks.compactLayoutInPlace(spark, root, Seq("p"))
      .select("id", "p").as[(Long, Int)].collect().toSet
    assert(after === before, "recovered + compacted data must be intact")
    assert(new java.io.File(base).listFiles().map(_.getName).toSet === Set("data"))

    // same contract for the unpartitioned form
    val root2 = s"$base/flat"
    rows.toDF("id", "p").repartition(5).write.parquet(root2)
    assert(new java.io.File(root2).renameTo(new java.io.File(s"$root2-__old__")))
    val after2 = Sinks.compactParquetInPlace(spark, root2, 1)
      .select("id", "p").as[(Long, Int)].collect().toSet
    assert(after2 === before)
  }

  test("crash recovery folds a writer-recreated root into __old__ before restoring " +
      "(pending-marker state)") {
    // worst case: the swap crashed between its two renames (marker +
    // __old__ = full copy), then an append-mode writer RECREATED root
    // with interim rows. Recovery must keep BOTH: old corpus restored,
    // interim files folded in — and never treat the sparse recreation
    // as healthy (which would let the preamble delete the full copy).
    val base = java.nio.file.Files.createTempDirectory("graft_crash2").toString
    val root = s"$base/data"
    val corpus = (0 until 80).map(i => (i.toLong, i % 2))
    corpus.toDF("id", "p").repartition(3).write.partitionBy("p").parquet(root)
    val f = new java.io.File(root)
    assert(f.renameTo(new java.io.File(s"$root-__old__")))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$root-__swap_pending__"))
    // interim writer recreates root with new rows only
    Seq((1000L, 0), (1001L, 1)).toDF("id", "p")
      .repartition(1).write.partitionBy("p").parquet(root)
    Sinks.recoverCrashedSwap(spark, root)
    val back = spark.read.parquet(root).select("id").as[Long].collect().toSet
    assert(back === (corpus.map(_._1).toSet ++ Set(1000L, 1001L)),
      "restored root must hold the full old corpus plus the interim rows")
    assert(new java.io.File(base).listFiles().map(_.getName).toSet === Set("data"),
      "marker and __old__ must be gone after recovery")
    // a stale __old__ with NO marker and a live root is a post-swap
    // leftover: recovery must leave root alone
    new java.io.File(s"$root-__old__").mkdirs()
    Sinks.recoverCrashedSwap(spark, root)
    assert(spark.read.parquet(root).select("id").as[Long].collect().toSet === back)
  }

  test("partitionBy write + partition-column filter prunes directories at plan time") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    (1 to 300).map(i => (i.toLong, if (i % 3 == 0) "O" else if (i % 3 == 1) "F" else "P"))
      .toDF("k", "status").write.mode("overwrite").partitionBy("status").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("status") === "O").select("k")
    q.collect()
    val scans = allPlanNodes(q.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty)
    // the status predicate must be a PARTITION filter (directory pruning),
    // not a data filter evaluated per row
    assert(scans.head.partitionFilters.exists(_.references.exists(_.name == "status")),
      s"expected partition pruning on status; filters: ${scans.head.partitionFilters}")
    assert(scans.head.relation.location.inputFiles.length > 1) // really partitioned
  }
}
