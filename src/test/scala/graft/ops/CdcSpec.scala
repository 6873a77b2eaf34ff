package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** snapshotDiff (CDC), scd2 (slowly-changing dimension) and the
  * bloom-pruned semi-join. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val oldS = Seq((1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c"))
      .toDF("k", "price", "tag")
    val newS = Seq((1, 10.0, "a"), (2, 22.0, "b"), (4, 40.0, "d"))
      .toDF("k", "price", "tag")
    val out = Ops.snapshotDiff(oldS, newS, Seq("k"), Seq("price", "tag"))
      .orderBy("k")
      .select("k", "change_type", "old_price", "new_price")
      .as[(Int, String, Option[Double], Option[Double])].collect()
    assert(out.sameElements(Array(
      (2, "update", Some(20.0), Some(22.0)),
      (3, "delete", Some(30.0), None),
      (4, "insert", None, Some(40.0)))))
  }

  test("snapshotDiff is null-safe: null→value is an update, null<=>null is not") {
    val oldS = Seq((1, None: Option[Double]), (2, None: Option[Double]))
      .toDF("k", "v")
    val newS = Seq((1, Some(1.0)), (2, None: Option[Double])).toDF("k", "v")
    val out = Ops.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .select("k", "change_type").as[(Int, String)].collect()
    assert(out.sameElements(Array((1, "update"))))
  }

  test("snapshotDiff: null keys never equi-match — they surface as delete + insert") {
    val oldS = Seq((Option(1), 10.0), (None: Option[Int], 99.0)).toDF("k", "v")
    val newS = Seq((Option(1), 10.0), (None: Option[Int], 99.0)).toDF("k", "v")
    val out = Ops.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .select("change_type").as[String].collect().sorted
    assert(out.sameElements(Array("delete", "insert")))
  }

  test("scd2 collapses runs into versions with a valid_from/valid_to chain") {
    // key 1: A,A,B,A → 3 versions (A recurring later is a NEW version)
    val e = Seq((1, "A", 10L, 1L), (1, "A", 20L, 2L), (1, "B", 30L, 3L),
        (1, "A", 40L, 4L), (2, "X", 5L, 5L))
      .toDF("k", "attr", "ts", "id")
    val out = Ops.scd2(e, "k", "attr", "ts", "id")
      .orderBy("k", "version")
      .select("k", "version", "attr", "valid_from", "valid_to")
      .as[(Int, Long, String, Long, Option[Long])].collect()
    assert(out.sameElements(Array(
      (1, 1L, "A", 10L, Some(30L)),
      (1, 2L, "B", 30L, Some(40L)),
      (1, 3L, "A", 40L, None),
      (2, 1L, "X", 5L, None))))
  }

  test("scd2 orders ties by tieCol and treats a null-attribute run as a version") {
    // same ts: id decides order → B before A; then null run, then A
    val e = Seq((1, "B", 10L, 1L), (1, "A", 10L, 2L),
        (1, null, 20L, 3L), (1, null, 25L, 4L), (1, "A", 30L, 5L))
      .toDF("k", "attr", "ts", "id")
    val out = Ops.scd2(e, "k", "attr", "ts", "id")
      .orderBy("version")
      .select("version", "attr", "valid_from")
      .as[(Long, Option[String], Long)].collect()
    assert(out.sameElements(Array(
      (1L, Some("B"), 10L), (2L, Some("A"), 10L),
      (3L, None, 20L), (4L, Some("A"), 30L))))
  }

  test("round-trip law: applyChangeset(old, snapshotDiff(old, new)) == new") {
    // randomized-ish but deterministic: inserts, deletes, updates, null
    // values, and untouched rows all present
    val oldS = (0 until 300).map(i =>
      (i, if (i % 11 == 0) None else Some(i * 1.5), s"tag${i % 7}"))
      .toDF("k", "v", "tag")
    val newS = (0 until 330).filter(_ % 13 != 0).map(i =>
      (i, if (i % 17 == 0) None else Some(i * (if (i % 5 == 0) 2.5 else 1.5)),
        s"tag${i % (if (i % 3 == 0) 6 else 7)}"))
      .toDF("k", "v", "tag")
    val diff = Ops.snapshotDiff(oldS, newS, Seq("k"), Seq("v", "tag"))
    val rebuilt = Ops.applyChangeset(oldS, diff, Seq("k"), Seq("v", "tag"))
      .select("k", "v", "tag").as[(Int, Option[Double], String)].collect().sorted
    val expected = newS
      .select("k", "v", "tag").as[(Int, Option[Double], String)].collect().sorted
    assert(rebuilt.sameElements(expected))
  }

  test("scd2: a history STARTING with a null attribute is still version 1") {
    val e = Seq((1, null, 10L, 1L), (1, "A", 20L, 2L), (2, null, 5L, 3L))
      .toDF("k", "attr", "ts", "id")
    val out = Ops.scd2(e, "k", "attr", "ts", "id")
      .orderBy("k", "version")
      .select("k", "version", "attr")
      .as[(Int, Long, Option[String])].collect()
    assert(out.sameElements(Array(
      (1, 1L, None), (1, 2L, Some("A")), (2, 1L, None))),
      "lag's null default must not collapse the first null run to version 0")
  }

  test("round-trip law holds with NULL keys in both snapshots") {
    val oldS = Seq((Option(1), 10.0), (None: Option[Int], 99.0),
      (Option(2), 20.0)).toDF("k", "v")
    val newS = Seq((Option(1), 10.0), (None: Option[Int], 77.0)).toDF("k", "v")
    val diff = Ops.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
    val rebuilt = Ops.applyChangeset(oldS, diff, Seq("k"), Seq("v"))
      .select("k", "v").as[(Option[Int], Double)].collect().sortBy(r => (r._1, r._2))
    val expected = newS
      .select("k", "v").as[(Option[Int], Double)].collect().sortBy(r => (r._1, r._2))
    assert(rebuilt.sameElements(expected),
      "null-keyed deletes need the null-safe anti-join to take effect")
  }

  test("bloomSemiJoin is exact for STRING keys (shared 64-bit probe domain)") {
    val big = (0 until 5000).map(i => (s"id_$i", i)).toDF("k", "payload")
    val keys = (0 until 5000 by 50).map(i => Tuple1(s"id_$i")).toDF("id")
    val viaBloom = Ops.bloomSemiJoin(big, keys, "k", "id",
      expectedItems = 1000L, fpp = 0.01).select("k").as[String].collect().sorted
    val exact = big.join(keys.withColumnRenamed("id", "k"), Seq("k"), "left_semi")
      .select("k").as[String].collect().sorted
    assert(viaBloom.sameElements(exact),
      "string keys must not fall into the build-string/probe-long domain split")
    assert(viaBloom.length === 100)
  }

  test("bloomSemiJoin equals the exact semi-join; the probe prunes non-members") {
    val big = (0L until 10000L).map(i => (i, i % 7)).toDF("k", "payload")
    val keys = (0L until 10000L by 100L).map(Tuple1(_)).toDF("id")  // 1% match
    val viaBloom = Ops.bloomSemiJoin(big, keys, "k", "id",
      expectedItems = 1000L, fpp = 0.01).select("k").as[Long].collect().sorted
    val exact = big.join(keys.withColumnRenamed("id", "k"), Seq("k"), "left_semi")
      .select("k").as[Long].collect().sorted
    assert(viaBloom.sameElements(exact))

    val probe = Ops.bloomProbe(keys, "id", expectedItems = 1000L, fpp = 0.01)
    val survivors = big.filter(probe(col("k"))).count()
    // no false negatives (≥ the 100 true members), and the 1% fpp bloom
    // keeps the false-positive tail far below the non-member count
    assert(survivors >= 100)
    assert(survivors < 100 + 1000, s"bloom pruned too little: $survivors")
  }

  test("merkleDiff: identical snapshots all-same; one changed row flips exactly its bucket") {
    val rows = (1 to 200).map(i => (i.toLong, i * 3L, s"s$i"))
    val a = rows.toDF("k", "v", "t")
    val same = Ops.merkleDiff(a, a, "k", Seq("v", "t"), buckets = 16)
      .select("status").as[String].collect()
    assert(same.nonEmpty && same.forall(_ == "same"))
    // flip one row's value: exactly one bucket reports changed, counts equal
    val b = rows.map { case (k, v, t) => (k, if (k == 42L) v + 1 else v, t) }
      .toDF("k", "v", "t")
    val diff = Ops.merkleDiff(a, b, "k", Seq("v", "t"), buckets = 16)
      .select("status", "n_a", "n_b").as[(String, Long, Long)].collect()
    assert(diff.count(_._1 == "changed") === 1, diff.toSeq.toString)
    diff.filter(_._1 == "changed").foreach { case (_, na, nb) => assert(na === nb) }
    // deletion surfaces as a count mismatch (changed) or an empty side
    val c = rows.filterNot(_._1 <= 100).toDF("k", "v", "t")
    val del = Ops.merkleDiff(a, c, "k", Seq("v", "t"), buckets = 16)
      .select("status").as[String].collect()
    assert(del.exists(s => s == "changed" || s == "only_a"))
    intercept[IllegalArgumentException] {
      Ops.merkleDiff(a, b, "k", Seq.empty)
    }
  }
}
