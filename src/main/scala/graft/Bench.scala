package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up scan/codegen paths so the first timed query isn't charged
    // for session initialization.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // A failed query must FAIL the bench visibly (error on stderr, listed
    // in "failed", nonzero exit) — a swallowed exception would record a
    // tiny wall-time and let a regression masquerade as a speedup.
    // Optional comma-separated query filter (repeated-run A/B timing of a
    // single query without the other 70 clouding the signal).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    // Machine-load context for the bench_full.json artifact: three runs of
    // the same HEAD differed 5× in round 9 (driver 542 s vs idle re-run
    // 235 s) purely from co-tenant contention. Recording 1/5/15-min
    // loadavg before and after lets a reader tell contention from
    // regression without re-running.
    def loadavg(): String = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
        .trim.split(" ").take(3).mkString(" ")
    } catch { case scala.util.control.NonFatal(_) => "" }
    val loadBefore = loadavg()
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      // a typo'd filter must not report an empty (vacuously green) bench
      require(unknown.isEmpty, s"SPARK_GRAFT_ONLY names unknown queries: $unknown")
    }
    def timeOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (String, Double, Option[String]) = {
      val t0 = System.nanoTime()
      // toRdd.count(), NOT DataFrame.count(): a count() on top lets the
      // optimizer prune every unused output column (final projections of
      // expensive expressions are skipped) and ELIMINATE left joins whose
      // right side has unique keys — txt_dsir_weight "ran" in 0.2 s while
      // the real pipeline costs ~3 s. toRdd executes the query's own
      // optimized plan with all output columns produced, which is what a
      // consumer writing the result would pay.
      val err = try { fn(spark, sfDir).queryExecution.toRdd.count(); None } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
          Some(e.getClass.getSimpleName)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Isolate queries from each other (UNTIMED — after the clock stops):
      // operators with a persist-and-return contract leave result-sized
      // frames cached; over a 170-query sweep those accumulated into GC
      // pressure that made rounds 8-9's warm pass slower than cold
      // (txt_contamination 3.9→12.1 s) and the second half of the cold
      // sweep pay for the first half's leftovers. Each measurement now
      // starts from an empty cache — steady state, not sweep position.
      spark.catalog.clearCache()
      (name, dt, err)
    }
    // Sorted-name iteration: Map order shifts whenever the registry gains
    // an entry, which reshuffles who pays shared first-touch costs
    // (MLlib/codegen classloading) and made r7→r8 cold diffs unreadable.
    // A stable order makes cold numbers comparable across rounds.
    val ordered = selected.toSeq.sortBy(_._1)
    val results = (1 to reps).flatMap(r => ordered.map { case (n, f) =>
      (if (reps > 1) s"$n#$r" else n) -> f
    }).map { case (name, fn) => timeOne(name, fn) }
    // Second WARM iteration per query (after the full cold sweep, so each
    // query's JIT/classload/page-cache state is steady): cross-round diffs
    // can then separate real regressions from cold-start noise (the round-7
    // sim_topk_agg 0.37->0.55 s blip was unclassifiable without this).
    // Cold times remain the headline "queries"/"total" — the driver
    // contract is unchanged. Skipped when reps>1 (reps already repeats).
    // Per-query cache isolation lives in timeOne (one round-9 clearCache
    // before the warm sweep was not enough — caches re-accumulated ACROSS
    // the warm pass itself and inverted warm vs cold for the second half
    // of the alphabet).
    // Close-sweep artifact: with REPS > 1, ALSO emit a per-face WARM
    // MEDIAN over reps 2..N (rep 1 carries the first-touch costs) —
    // single-sweep warm numbers on this machine flag a different
    // rotating block of co-tenant-inflated faces every run, and every
    // round since 13 has paid a page of adjudication for it; medians
    // across reps kill the placement noise at the artifact level. Use
    // an EVEN REPS (e.g. 4 → 3 warm reps, true middle element) for the
    // close sweep.
    val warmMedian: Map[String, Double] =
      if (reps <= 1) Map.empty
      else results
        .collect { case (k, v, None) if !k.endsWith("#1") =>
          (k.substring(0, k.lastIndexOf('#')), v) }
        .groupBy(_._1).map { case (n, vs) =>
          val s = vs.map(_._2).sorted
          val m =
            if (s.length % 2 == 1) s(s.length / 2)
            else (s(s.length / 2 - 1) + s(s.length / 2)) / 2
          n -> m
        }
    val warmOn = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") == "1" && reps == 1
    // Warm failures carry a #warm suffix in "failed": a query failing in
    // both passes is listed twice otherwise, indistinguishable from two
    // different failures (and a warm-only failure looked cold).
    val warm = if (warmOn) ordered.map { case (n, f) => timeOne(n, f) } else Nil
    // millisecond precision: 161 queries at full double precision is a
    // ~5 KB stdout line, which overflowed the driver's log tail in round
    // 8; 3 decimals halves it and 1 ms granularity loses nothing a
    // cross-round diff can use
    def r3(v: Double): Double = math.rint(v * 1000) / 1000
    val qs = results.map { case (k, v, err) =>
      s"\"" + k + "\":" + (if (err.isEmpty) r3(v) else -1.0) }.mkString("{", ",", "}")
    val warmQs = warm.map { case (k, v, err) =>
      s"\"" + k + "\":" + (if (err.isEmpty) r3(v) else -1.0) }.mkString("{", ",", "}")
    val failed = (results.map(r => (r._1, r._3)) ++
        warm.map(r => (r._1 + "#warm", r._3)))
      .collect { case (k, Some(_)) => s"\"$k\"" }.mkString("[", ",", "]")
    val total = r3(results.collect { case (_, v, None) => v }.sum)
    // Stdout stays the compact driver contract (cold "queries"/"total" +
    // failures); the warm map goes ONLY to the bench_full.json artifact —
    // round 8's stdout line with the inline warm map overflowed the
    // driver's log-tail parser ("parsed": null).
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    val warmField = if (warmOn) s""","warm":$warmQs""" else ""
    val warmMedField =
      if (warmMedian.isEmpty) ""
      else warmMedian.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + r3(v) }
        .mkString(""","warm_median":{""", ",", "}")
    val loadField =
      s""","loadavg_before":"$loadBefore","loadavg_after":"${loadavg()}""""
    val fullLine = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$warmField$warmMedField$loadField,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // The driver's log tail truncates the stdout line on big registries, so
    // ALSO write the complete per-query map to a stable file — cross-round
    // perf diffs read this instead of scraping logs. The file is a
    // best-effort artifact: an unwritable path must not fail a green
    // bench (the authoritative output already printed above).
    try {
      val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fullLine + "\n").getBytes("UTF-8"))
    } catch {
      // NonFatal, not just IOException: Paths.get throws InvalidPathException
      // and Files.write can throw SecurityException — none of which should
      // fail an otherwise-green bench (the authoritative line already printed).
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench_full.json not written: ${e.getMessage}")
    }
    spark.stop()
    if ((results ++ warm).exists(_._3.nonEmpty)) sys.exit(1)
  }
}
