package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("P3 normalizeColumns: trim + literal space/dot → underscore") {
    val df = Seq((1, 2, 3)).toDF(" a b ", "c.d", "plain")
    assert(Ops.normalizeColumns(df).columns.sameElements(
      Array("a_b", "c_d", "plain")))
  }

  test("W3 dedupKeys keeps exactly the tie-break-first row per key") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "z", 30)).toDF("k", "tb", "v")
    val out = Ops.dedupKeys(df, Seq("k"), Seq(col("tb")))
      .orderBy("k").as[(Int, String, Int)].collect()
    assert(out.sameElements(Array((1, "a", 10), (2, "z", 30))))
  }

  test("W3 dedupKeys is deterministic across repartitionings") {
    val df = Seq.tabulate(100)(i => (i % 10, i)).toDF("k", "v")
    val a = Ops.dedupKeys(df.repartition(7), Seq("k"), Seq(col("v")))
      .orderBy("k").as[(Int, Int)].collect()
    val b = Ops.dedupKeys(df.repartition(3), Seq("k"), Seq(col("v")))
      .orderBy("k").as[(Int, Int)].collect()
    assert(a.sameElements(b))
    assert(a.forall { case (k, v) => v === k }) // min v for key k is k itself
  }

  test("asofJoin: latest prior right row per key, inclusive ties, null before first") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"),
        (2L, 10L, "f1"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("k", "t", "v")
    val out = Ops.asofJoin(left, right, Seq("k"), "t", Seq("v"))
      .orderBy("k", "t").select("k", "t", "name", "v")
      .as[(Long, Long, String, Option[Double])].collect()
    assert(out.sameElements(Array(
      (1L, 5L, "e0", None),          // before any right row
      (1L, 10L, "e1", Some(100.0)),  // tie at t=10 is INCLUSIVE
      (1L, 20L, "e2", Some(150.0)),  // latest prior (15), not first (10)
      (2L, 10L, "f1", None))))       // key with no right rows at all
  }

  test("asofJoin: SQL null semantics and atomic multi-column attachment") {
    // a null right VALUE rides with its own row (no tearing across rows),
    // and null keys/times on the right never match anything
    val left = Seq((Some(1L), 10L, "x"), (Option.empty[Long], 10L, "nullkey"))
      .toDF("k", "t", "name")
    val right = Seq(
        (Some(1L), Some(5L), Some(9.0), Some(100L)),
        (Some(1L), Some(8L), Option.empty[Double], Some(200L)), // newest: null v
        (Some(1L), Option.empty[Long], Some(777.0), Some(300L)), // null time: dropped
        (Option.empty[Long], Some(1L), Some(888.0), Some(400L))) // null key: dropped
      .toDF("k", "t", "v", "rid")
    val out = Ops.asofJoin(left, right, Seq("k"), "t", Seq("v", "rid"))
      .orderBy("name").select("name", "v", "rid")
      .as[(String, Option[Double], Option[Long])].collect()
    // newest matching row is (t=8, v=null, rid=200): v must be null WITH
    // rid=200 — not v=9.0 from the older row
    assert(out(0) === (("nullkey", None, None)))
    assert(out(1) === (("x", None, Some(200L))))
  }

  test("rangeJoin: inclusive bounds, bucket-crossing intervals, key isolation") {
    import org.apache.spark.sql.functions.timestamp_micros
    val left = Seq((1L, 0L, "a"), (1L, 100L, "b"), (1L, 250L, "c"), (2L, 100L, "d"))
      .toDF("k", "us", "name")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("name"))
    // interval [50, 150] crosses the 100-us bucket boundary; [200, 210] doesn't
    val right = Seq((1L, 50L, 150L, "i1"), (1L, 200L, 210L, "i2"), (2L, 0L, 300L, "i3"))
      .toDF("k", "s_us", "e_us", "iv")
      .select(col("k"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"), col("iv"))
    val out = Ops.rangeJoin(left, right, Seq("k"), "ts", "s", "e", bucketMicros = 100L)
      .select("name", "iv").as[(String, String)].collect().toSet
    // b(100) ∈ [50,150] (bucket-crossing); c(250) ∉ either k=1 interval;
    // d matches only k=2's interval — no cross-key leakage
    assert(out === Set(("b", "i1"), ("d", "i3")))
    // boundary inclusivity: t == start AND t == end both match
    val edges = Ops.rangeJoin(
      Seq((1L, 50L), (1L, 150L)).toDF("k", "us")
        .select(col("k"), timestamp_micros(col("us")).as("ts")),
      right.filter(col("iv") === "i1"), Seq("k"), "ts", "s", "e", 100L).count()
    assert(edges === 2L)
    // a rogue interval covering > maxBucketsPerInterval buckets fails
    // loudly instead of materializing an unbounded sequence
    val rogue = Seq((1L, 0L, 10_000_000L, "huge")).toDF("k", "s_us", "e_us", "iv")
      .select(col("k"), timestamp_micros(col("s_us")).as("s"),
        timestamp_micros(col("e_us")).as("e"), col("iv"))
    val err = intercept[Exception] {
      Ops.rangeJoin(left, rogue, Seq("k"), "ts", "s", "e",
        bucketMicros = 100L, maxBucketsPerInterval = 16).count()
    }
    assert(err.getMessage.contains("rangeJoin"))
  }

  test("deterministicSplit spreads STRUCTURED keys (stepped by 1000) across splits") {
    // regression: a low-bits modular hash makes every key ≡ r (mod 1000)
    // land in ONE split; the high-bits quotient must spread them ~80/10/10
    val df = (1 to 300).map(i => Tuple1(i * 1000L)).toDF("k")
    val counts = Ops.deterministicSplit(df, "k")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "val", "test"),
      s"structured keys collapsed into: $counts")
    assert(counts("train") > 200 && counts("train") < 280, s"skewed: $counts")
  }

  test("hashSample: deterministic membership, permille bounds, null keys dropped") {
    val df = ((0L until 1000L).map(Option(_)) :+ None).toDF("k")
    val s1 = Ops.hashSample(df, "k", 250).as[Long].collect().toSet
    val s2 = Ops.hashSample(df, "k", 250).as[Long].collect().toSet
    assert(s1 === s2, "same keys must survive every run")
    // multiplicative hash over 0..999 is near-uniform; exact count is
    // deterministic, so pin the observed value tightly around 25%
    assert(s1.size > 200 && s1.size < 300, s"got ${s1.size}")
    assert(Ops.hashSample(df, "k", 0).count() === 0)
    assert(Ops.hashSample(df, "k", 1000).count() === 1000) // null dropped
    // the default sample seed is decorrelated from the split's bucket
    // stream, so a sampled corpus still has all three splits at sane rates
    val bySplit = Ops.deterministicSplit(Ops.hashSample(df, "k", 500), "k")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    assert(bySplit("train") > 300, s"train starved: $bySplit")
    // with the split's own seed the two CORRELATE completely: a 50%
    // sample is all-train — the trap the seed default exists to avoid
    val correlated = Ops.deterministicSplit(
      Ops.hashSample(df, "k", 500, seed = 0L), "k")
      .select("split").distinct().as[String].collect().toSeq
    assert(correlated === Seq("train"))
  }

  test("weightedSample: per-stratum rates, each stratum ≡ hashSample at its rate, 0 drops all") {
    val rows = (0L until 500L).map(i => ("keep", i)) ++
      (500L until 1000L).map(i => ("thin", i)) ++
      (1000L until 1500L).map(i => ("drop", i)) ++
      (1500L until 2000L).map(i => ("other", i))
    val df = rows.toDF("src", "id")
    val out = Ops.weightedSample(df, "src", "id",
      Map("keep" -> 1000, "thin" -> 100, "drop" -> 0), defaultPermille = 500)
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("keep") === 500L)
    assert(!bySrc.contains("drop"))
    assert(bySrc("thin") > 20 && bySrc("thin") < 180, s"thin off-rate: $bySrc")
    assert(bySrc("other") > 180 && bySrc("other") < 320, s"default off-rate: $bySrc")
    // per-stratum survivors are EXACTLY hashSample of that slice (same seed)
    val thinIds = out.filter(col("src") === "thin").select("id").as[Long].collect().toSet
    val expect = Ops.hashSample(df.filter(col("src") === "thin"), "id", 100)
      .select("id").as[Long].collect().toSet
    assert(thinIds === expect)
    // rates outside [0, 1000] are rejected
    intercept[IllegalArgumentException] {
      Ops.weightedSample(df, "src", "id", Map("keep" -> 1001), 500)
    }
  }

  test("temperatureMix: sqrt-derived rates, smallest stratum whole, each stratum ≡ hashSample") {
    // 900 web + 400 mid + 100 rare → rates floor(1000·sqrt(100/c)):
    // web 333, mid 500, rare 1000
    val rows = (0L until 900L).map(i => ("web", i)) ++
      (900L until 1300L).map(i => ("mid", i)) ++
      (1300L until 1400L).map(i => ("rare", i))
    val df = rows.toDF("src", "id")
    val out = Ops.temperatureMix(df, "src", "id")
    assert(out.columns.sameElements(df.columns), "helper columns must not leak")
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("rare") === 100L, "smallest stratum keeps everything")
    // flattening, not inversion: web still largest, but its multiple of
    // rare shrinks from 9× toward 3× (sqrt of the count ratio)
    assert(bySrc("web") > bySrc("mid") && bySrc("mid") > bySrc("rare"), s"$bySrc")
    assert(bySrc("web") < 5 * bySrc("rare"), s"web under-flattened: $bySrc")
    // per-stratum survivors are EXACTLY hashSample at the derived rate —
    // temperature mixing composes with the whole sample/split family
    for ((s, c) <- Seq(("web", 900), ("mid", 400), ("rare", 100))) {
      val rate = math.floor(1000.0 * math.sqrt(100.0 / c)).toInt
      val got = out.filter(col("src") === s).select("id").as[Long].collect().toSet
      val expect = Ops.hashSample(df.filter(col("src") === s), "id", rate)
        .select("id").as[Long].collect().toSet
      assert(got === expect, s"stratum $s must equal hashSample at rate $rate")
    }
    // null stratum is its own stratum; null keys are dropped
    val withNulls = ((0L until 50L).map(i => (Option("a"), Option(i))) ++
      (50L until 60L).map(i => (Option.empty[String], Option(i))) :+
      ((Option("a"), Option.empty[Long]))).toDF("src", "id")
    val nOut = Ops.temperatureMix(withNulls, "src", "id")
      .as[(Option[String], Option[Long])].collect()
    assert(nOut.count(_._1.isEmpty) === 10L, "null stratum is smallest → kept whole")
    assert(!nOut.exists(_._2.isEmpty), "null keys have no deterministic identity")
  }

  test("SHUFFLE_HASH hint pins a ShuffledHashJoin physical plan (the j8 contract)") {
    val l = (1 to 500).map(i => (i.toLong, i)).toDF("k", "v")
    val r = (1 to 500).map(i => (i.toLong, s"s$i")).toDF("k", "s")
    val plan = l.join(r.hint("SHUFFLE_HASH"), Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"SHUFFLE_HASH hint must select the shuffled hash strategy:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"hint ignored:\n$plan")
  }

  test("temperatureMix plan: corpus joins the rate table by broadcast, never sort-merge") {
    val df = (0L until 300L).map(i => (s"s${i % 3}", i)).toDF("src", "id")
    val plan = Ops.temperatureMix(df, "src", "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rate table must broadcast onto the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the rate join:\n$plan")
  }

  test("stratifiedSample: exactly k per stratum, small strata whole, null stratum kept") {
    val rows = (0L until 100L).map(i => (Option("a"), i)) ++
      (100L until 130L).map(i => (Option("b"), i)) ++
      (130L until 135L).map(i => (Option.empty[String], i))
    val df = rows.toDF("src", "id")
    val out = Ops.stratifiedSample(df, "src", "id", k = 20)
      .as[(Option[String], Long)].collect()
    val bySrc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(bySrc(Some("a")).size === 20)
    assert(bySrc(Some("b")).size === 20)
    assert(bySrc(None).size === 5) // stratum smaller than k → all rows
    // deterministic across invocations
    assert(Ops.stratifiedSample(df, "src", "id", k = 20)
      .as[(Option[String], Long)].collect().toSet === out.toSet)
    // and identical to the row_number window reference formulation
    // (seed 1 → key shifted by +1 before the multiply)
    val bucket = pmod(floor(pmod(col("id") + 1L, lit(1000003L)) * lit(2654435761L)
      / lit(1048576.0)).cast("long"), lit(1000L))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(bucket, col("id"))
    val ref = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 20).select("src", "id")
      .as[(Option[String], Long)].collect().toSet
    assert(out.toSet === ref)
  }

  test("hashSample plan: map-only — no Exchange anywhere") {
    val df = (0L until 100L).toDF("k")
    val plan = Ops.hashSample(df, "k", 250).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample must not shuffle:\n$plan")
  }

  test("weightedSample plan: map-only — no Exchange anywhere") {
    val df = (0L until 100L).map(i => (s"s${i % 3}", i)).toDF("src", "id")
    val plan = Ops.weightedSample(df, "src", "id", Map("s0" -> 100), 500)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"weighted sample must not shuffle:\n$plan")
  }

  test("stratifiedSample plan: broadcast semi-join back, corpus not shuffled for the join") {
    val df = (0L until 200L).map(i => (s"s${i % 4}", i)).toDF("src", "id")
    val plan = Ops.stratifiedSample(df, "src", "id", k = 5)
      .queryExecution.executedPlan.toString
    // the keep-list side is broadcast (LeftSemi BroadcastHashJoin); a
    // SortMergeJoin here would mean the whole corpus shuffles on the key
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast left-semi join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for join:\n$plan")
  }

  test("deterministicSplit: null keys get a NULL label, not 'test'") {
    val df = Seq(Some(42L), None, Some(7L), None).toDF("k")
    val bySplit = Ops.deterministicSplit(df, "k")
      .groupBy("split").count().collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    assert(bySplit.getOrElse(null, 0L) === 2L, s"null keys must label null: $bySplit")
    assert(bySplit.collect { case (k, n) if k != null => n }.sum === 2L,
      s"null keys leaked into a real split: $bySplit")
  }

  test("A6 surrogateKey: dense 0-based ids, stable under re-run") {
    val df = Seq(("x", 1), ("y", 2), ("x", 1), ("z", 3)).toDF("a", "b")
    val out = Ops.surrogateKey(df, Seq("a", "b"), "id")
      .orderBy("id").as[(String, Int, Long)].collect()
    assert(out.sameElements(Array(("x", 1, 0L), ("y", 2, 1L), ("z", 3, 2L))))
  }

  test("R1/R2 dropLeading + dropTrailing under explicit order") {
    val df = (1 to 10).toDF("n")
    assert(Ops.dropLeading(df, 3, Seq(col("n"))).as[Int].collect().sorted
      .sameElements(4 to 10))
    assert(Ops.dropTrailing(df, 2, Seq(col("n"))).as[Int].collect().sorted
      .sameElements(1 to 8))
  }

  test("R4 promoteHeader renames columns from the first ordered row") {
    val df = Seq((0L, "key", "name"), (1L, "1", "alpha"), (2L, "2", "beta"))
      .toDF("__idx", "_c0", "_c1")
    val out = Ops.promoteHeader(df, "__idx")
    assert(out.columns.sameElements(Array("__idx", "key", "name")))
    assert(out.count() === 2)
    assert(out.orderBy("__idx").drop("__idx").as[(String, String)].collect()
      .sameElements(Array(("1", "alpha"), ("2", "beta"))))
  }

  test("promoteHeader survives a header value that equals another column name") {
    // header renames _c0 → "_c1": a sequential rename fold would briefly
    // hold two _c1 columns and corrupt the second rename
    val df = Seq((0L, "_c1", "v"), (1L, "a", "b")).toDF("__idx", "_c0", "_c1")
    val out = Ops.promoteHeader(df, "__idx")
    assert(out.columns.sameElements(Array("__idx", "_c1", "v")))
    assert(out.select("_c1", "v").as[(String, String)].head() === (("a", "b")))
  }

  test("W1/W2 melt: wide → long with int var, nulls dropped") {
    val wide = Seq((1, Some(10.0), None: Option[Double]), (2, Some(20.0), Some(21.0)))
      .toDF("id", "2001", "2002")
    val out = Ops.melt(wide, Seq("id"), "Year", "v")
      .orderBy("id", "Year").as[(Int, Int, Double)].collect()
    assert(out.sameElements(Array((1, 2001, 10.0), (2, 2001, 20.0), (2, 2002, 21.0))))
  }

  test("melt round-trips pivot (row count = non-null cells)") {
    val long = Seq((1, 2001, 1.0), (1, 2002, 2.0), (2, 2001, 3.0))
      .toDF("id", "yr", "v")
    val wide = long.groupBy("id").pivot("yr").agg(first("v"))
    assert(Ops.melt(wide, Seq("id"), "yr", "v").count() === 3)
  }

  test("budgetSelect: greedy by score within stratum, boundary kept on equality") {
    val rows = Seq(
      // stratum "x": 20 tokens total → budget 10; greedy keeps the
      // score-0.9 row (cum 10 == budget, <= keeps it), drops the rest
      (1L, Some("x"), 10L, 0.9), (2L, Some("x"), 5L, 0.8), (3L, Some("x"), 5L, 0.7),
      // stratum "y": equal scores → doc_id breaks the tie; 30 total →
      // budget 15 → first row only (cum 10; second hits 25 > 15)
      (4L, Some("y"), 10L, 0.5), (5L, Some("y"), 15L, 0.5),
      // NULL stratum is its own group: 8 total → budget 4 → nothing fits
      (6L, None, 8L, 0.9))
      .toDF("id", "stratum", "n_tokens", "score")
    val out = Ops.budgetSelect(rows, "stratum", "id", "n_tokens", "score")
      .select("id", "cum_tokens", "kept")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ((10L, true)) && out(2L) === ((15L, false)) &&
      out(3L) === ((20L, false)))
    assert(out(4L) === ((10L, true)) && out(5L) === ((25L, false)))
    assert(out(6L) === ((8L, false)))
    assert(out.size === 6) // every input row surfaces with its audit columns
  }

  test("shuffleShards: deterministic dense per-shard layout, reseedable, null-safe") {
    val ids = ((1L to 200L).map(Option(_)) :+ (None: Option[Long])).toDF("doc_id")
    val a = Ops.shuffleShards(ids, "doc_id", numShards = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // null key dropped; every non-null key addressed exactly once
    assert(a.map(_._1).toSeq === (1L to 200L))
    // per shard: positions are exactly 1..size (dense, no gaps/dupes)
    a.groupBy(_._2).foreach { case (shard, rows) =>
      assert(shard >= 0 && shard < 4)
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // all shards populated on 200 keys (p(miss) astronomically small)
    assert(a.map(_._2).distinct.length === 4)
    // same seed reproduces bit-identically; a new seed deals a new order
    val b = Ops.shuffleShards(ids, "doc_id", numShards = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    val c = Ops.shuffleShards(ids, "doc_id", numShards = 4, seed = "epoch2")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq !== c.toSeq)
  }

  test("fuzzyJoinEditDistance ≡ unblocked all-pairs on an adversarial corpus") {
    // Designed to stress the prefix filter: first-char edits (what naive
    // first-letter blocking misses), repeated-gram strings ("aaaaaaa",
    // "abcabcabc" — distinct-gram sets much smaller than positional
    // counts), globally common grams, and length-boundary strings.
    val leftNames = Seq("aaaaaaa", "abcabcabcabc", "the cat sat", "common ring",
      "common rung", "shorty", "widget blue", "xyzzy plugh")
    val rightNames = Seq(
      "aaabaaa",        // mid edit in the repeated-gram string
      "babcabcabcabc",  // prepend to the periodic string
      "bbcabcabcabc",   // first-char substitution
      "he cat sat",     // first char dropped
      "the cat sats",   // append
      "common ring",    // exact
      "comman rung",    // mid substitution near a twin pair
      "shortyx", "horty", "widget blues", "zyzzy plugh", "unrelated pair")
    val l = leftNames.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("lid", "lname")
    val r = rightNames.zipWithIndex.map { case (n, i) => (100L + i, n) }
      .toDF("rid", "rname")
    val blocked = Ops.fuzzyJoinEditDistance(l, r, "lid", "rid", "lname", "rname",
        q = 3, maxDist = 1)
      .select("left_id", "right_id", "dist").as[(Long, Long, Int)]
      .collect().toSet
    val brute = l.filter(length(col("lname")) >= 6)
      .crossJoin(r.filter(length(col("rname")) >= 6))
      .withColumn("dist", levenshtein(col("lname"), col("rname")))
      .filter(col("dist") <= 1)
      .select("lid", "rid", "dist").as[(Long, Long, Int)].collect().toSet
    assert(blocked === brute,
      s"blocked missed ${brute -- blocked} / extra ${blocked -- brute}")
    // the corpus exercises real matches, not a vacuous empty set — incl.
    // the first-char cases and both repeated-gram cases
    assert(brute.contains((0L, 100L, 1)), "aaaaaaa ~ aaabaaa")
    assert(brute.contains((1L, 101L, 1)), "periodic prepend")
    assert(brute.contains((1L, 102L, 1)), "periodic first-char sub")
    assert(brute.contains((2L, 103L, 1)), "first char dropped")
    assert(brute.size >= 8, s"expected a rich match set, got $brute")
  }

  test("fuzzyJoinEditDistance completeness survives duplicate ids and rows") {
    // Repeated identical rows would double every gram inside a pooled
    // prefix ranking (silently halving the effective prefix); a reused id
    // carrying a DIFFERENT string would pool two strings' grams into one
    // ranking. Neither may cost matches: inputs are deduped on (id, name)
    // and the rank window partitions by both.
    val l = Seq(
      (0L, "common ring"), (0L, "common ring"), // exact duplicate row
      (0L, "widget blue"),                      // same id, different string
      (1L, "the cat sat")).toDF("lid", "lname")
    val r = Seq(
      (100L, "common rung"), (100L, "common rung"),
      (100L, "widget blues"),
      (101L, "he cat sat")).toDF("rid", "rname")
    val blocked = Ops.fuzzyJoinEditDistance(l, r, "lid", "rid", "lname", "rname",
        q = 3, maxDist = 1)
      .select("left_name", "right_name").as[(String, String)].collect()
    val brute = l.distinct().crossJoin(r.distinct())
      .filter(length(col("lname")) >= 6 && length(col("rname")) >= 6)
      .filter(levenshtein(col("lname"), col("rname")) <= 1)
      .select("lname", "rname").as[(String, String)].collect().toSet
    assert(blocked.toSet === brute,
      s"missed ${brute -- blocked.toSet} / extra ${blocked.toSet -- brute}")
    assert(blocked.length === blocked.toSet.size, "duplicate output pairs")
    assert(brute.size >= 3, s"expected 3 planted matches, got $brute")
  }
}
