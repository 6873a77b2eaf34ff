package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Layout contract of the range-sharded sorted export: disjoint
  * monotonically-increasing key ranges across files, sorted rows within
  * each file, no rows lost. */
class ShardExportSpec extends SparkSpec {
  import spark.implicits._

  test("rangeShardedExport: files carry disjoint sorted key ranges; content round-trips") {
    val out = java.nio.file.Files.createTempDirectory("graft_shard_test").toString
    val df = (0L until 1000L).map(i => (i, s"row $i")).toDF("id", "payload")
      .repartition(13) // scrambled input layout
    val back = Sinks.rangeShardedExport(df, s"$out/t", shards = 8, sortCol = "id")
    assert(back.count() === 1000)
    assert(back.select(sum(col("id"))).as[Long].head() === 999L * 1000 / 2)

    val files = new java.io.File(s"$out/t").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map(_.getPath).sorted
    assert(files.length === 8, s"expected 8 shard files, got ${files.length}")
    // per-file: rows sorted, and file ranges are disjoint & ordered
    val ranges = files.map { f =>
      val ids = spark.read.parquet(f).select("id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"file $f is not sorted")
      (ids.min, ids.max)
    }
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"file ranges overlap: max $hiA vs next min $loB")
      case _ =>
    }
  }
}
