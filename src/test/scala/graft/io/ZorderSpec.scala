package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Rows the parquet scan actually emitted (post row-group/page pruning). */
  private def rowsScanned(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = allPlanNodes(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no FileSourceScanExec in plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("interleave: exact Morton bit positions, column j at bit i*n+j") {
    // x=0b11 → output bits 0,2 = 5; y=0b01 → output bit 1 = 2; z = 7
    // x=0b10, y=0b11 → x:bit1→pos2 (4); y:bit0→pos1 (2), bit1→pos3 (8) = 14
    val out = Seq((3L, 1L), (2L, 3L), (0L, 0L)).toDF("x", "y")
      .select(Zorder.interleave(Seq(col("x"), col("y")), 2).as("z"))
      .as[Long].collect()
    assert(out.sameElements(Array(7L, 14L, 0L)))
  }

  test("bucketize: range endpoints clamp, nulls and degenerate ranges → 0") {
    val vals = Seq(Some(0.0), Some(5.0), Some(10.0), None).toDF("v")
    val b = vals.select(Zorder.bucketize(col("v"), 0.0, 10.0, 4).as("b"))
      .as[Long].collect()
    assert(b(0) === 0L && b(3) === 0L)
    assert(b(2) === 15L)             // hi endpoint → top bucket, clamped
    assert(b(1) >= 6L && b(1) <= 8L) // midpoint lands mid-range
    assert(vals.select(Zorder.bucketize(col("v"), 5.0, 5.0, 4).as("b"))
      .as[Long].collect().forall(_ === 0L))
  }

  test("z-order write round-trips the row set and prunes on the SECOND column") {
    val n = 200000
    // two independent uniform dimensions (decorrelated hashes of the id)
    val df = spark.range(n.toLong).select(
      pmod(xxhash64(col("id")), lit(1000)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1000)).as("y"),
      col("id"))
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
    Zorder.write(df, Seq("x", "y"), zDir, bits = 10, partitions = 4,
      blockSize = Some(128 * 1024))
    // the single-column alternative: same file/row-group geometry, sorted
    // by x only — clusters x but leaves y random within every row group
    df.withColumn("__s", col("x"))
      .repartitionByRange(4, col("__s")).sortWithinPartitions("__s").drop("__s")
      .write.mode("overwrite")
      .option("parquet.block.size", (128 * 1024).toString)
      .option("parquet.page.size", (16 * 1024).toString)
      .parquet(linDir)

    // row set unchanged by the re-layout
    val zIds = spark.read.parquet(zDir).select("id").as[Long].collect().sorted
    assert(zIds.sameElements(0L until n.toLong))

    // filter on y (the SECOND z column): z-layout must scan far less than
    // the x-sorted layout, where y min/max spans ~everything per group
    val zRows = rowsScanned(spark.read.parquet(zDir).filter(col("y") < 10))
    val linRows = rowsScanned(spark.read.parquet(linDir).filter(col("y") < 10))
    val trueRows = df.filter(col("y") < 10).count()
    assert(zRows >= trueRows, "scan cannot emit fewer rows than the answer")
    assert(zRows < linRows / 2,
      s"z-order should at least halve the scan: z=$zRows linear=$linRows (true=$trueRows)")
  }
}
