package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  // Heavy skew: 90% of the large side shares key 1.
  private def large = (1 to 1000)
    .map(i => (if (i <= 900) 1 else i % 50, i)).toDF("k", "v")
  private def dim = (0 until 50).map(i => (i, s"name_$i")).toDF("k", "name")

  test("saltedJoin result equals the plain join (inner)") {
    val plain = large.join(dim, Seq("k")).orderBy("v")
      .as[(Int, Int, String)].collect()
    val salted = Ops.saltedJoin(large, dim, Seq("k"), salts = 8).orderBy("v")
      .as[(Int, Int, String)].collect()
    assert(salted.sameElements(plain))
  }

  test("saltedJoin left join preserves unmatched rows") {
    val l = Seq((1, "a"), (99, "b")).toDF("k", "v")
    val out = Ops.saltedJoin(l, dim, Seq("k"), salts = 4, "left")
      .orderBy("k").select("k", "name").collect()
    assert(out.length === 2)
    assert(out(0).getString(1) === "name_1")
    assert(out(1).isNullAt(1))   // key 99 not in dim, still present
  }

  test("right/full outer join types are rejected (would duplicate unmatched dim rows)") {
    intercept[IllegalArgumentException] {
      Ops.saltedJoin(large, dim, Seq("k"), 4, "full_outer")
    }
    intercept[IllegalArgumentException] {
      Ops.saltedJoin(large, dim, Seq("k"), 4, "right")
    }
  }

  test("hot key's rows spread across multiple salt values — even exact duplicates") {
    // the implementation's round-robin counter salt, exercised on the
    // WORST case for the old content-hash design: exact-duplicate rows
    // (identical content must still spread — a content hash sends them
    // all to one salt)
    val dupes = Seq.fill(800)((1, "same-payload")).toDF("k", "v")
    val salted = dupes.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
    val spread = salted.select("__salt").distinct().count()
    assert(spread === 8, s"duplicate hot-key rows hit only $spread of 8 salts")
    // and through the REAL operator: the join result over a duplicate-row
    // hot key matches the unsalted join exactly (salt is invisible)
    val dim = Seq((1, "one"), (2, "two")).toDF("k", "name")
    val viaSalted = Ops.saltedJoin(dupes, dim, Seq("k"), salts = 8)
      .select("k", "v", "name").collect()
    assert(viaSalted.length === 800)
    assert(viaSalted.forall(r => r.getString(2) == "one"))
  }
}
