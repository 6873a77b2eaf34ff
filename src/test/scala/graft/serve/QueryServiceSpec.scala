package graft.serve

import graft.SparkSpec

class QueryServiceSpec extends SparkSpec {
  import spark.implicits._

  private def svc = new QueryService(
    Map("t1" -> (() => Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "v"))),
    Map("t1" -> Seq("k")))

  test("getData: whitelisted table, deterministic order, bounded rows") {
    val out = svc.getData("t1", 2).as[(Int, String)].collect()
    assert(out.sameElements(Array((1, "a"), (2, "b"))))
  }

  test("unknown table rejected with the known-table list (no SQL assembly)") {
    val e = intercept[IllegalArgumentException](svc.getData("t2; DROP TABLE x", 5))
    assert(e.getMessage.contains("known: t1"))
  }

  test("negative limit rejected") {
    intercept[IllegalArgumentException](svc.getData("t1", -1))
  }

  test("limit larger than the table returns all rows") {
    assert(svc.getData("t1", 100).count() === 3)
  }

  test("overParquetDir serves a parquet directory lazily") {
    val s = QueryService.overParquetDir(spark, "/root/testdata/sf0.001",
      Seq("region", "nation"), Map("region" -> Seq("r_regionkey")))
    assert(s.tableNames === Set("region", "nation"))
    val rows = s.getData("region", 3).collect()
    assert(rows.length === 3 && rows(0).getInt(0) === 0)
  }
}
