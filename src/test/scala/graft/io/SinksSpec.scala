package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.Exchange

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle (co-located SortMergeJoin)") {
    // The in-memory catalog forgets tables across JVMs but their warehouse
    // dirs survive — drop both and remove orphan locations.
    Seq("graft_bkt_a", "graft_bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
        }
        rm(loc)
      }
    }
    val n = 10000
    val facts = (1 to n).map(i => (i % 500, i.toDouble)).toDF("k", "x")
    val other = (1 to n).map(i => (i % 500, s"s$i")).toDF("k", "s")
    Sinks.writeBucketed(facts, "graft_bkt_a", Seq("k"), 8, Seq("k"))
    Sinks.writeBucketed(other, "graft_bkt_b", Seq("k"), 8, Seq("k"))
    val joined = spark.sql(
      """SELECT /*+ MERGE(a) */ a.k, a.x, b.s
        |FROM graft_bkt_a a JOIN graft_bkt_b b ON a.k = b.k""".stripMargin)
    val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.isEmpty,
      s"bucketed join should not shuffle; found: ${exchanges.map(_.nodeName)}")
    assert(joined.count() === n.toLong * (n / 500))
  }
}
