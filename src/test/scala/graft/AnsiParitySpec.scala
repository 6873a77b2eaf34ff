package graft

/** README claims the engine runs identically with ANSI mode on (Spark 4
  * default) or off, because lenient semantics are expressed with
  * try_cast/try_divide rather than by relying on silent-null coercion.
  * Pin that: the cleaning-family queries must produce identical rows
  * under both settings. */
class AnsiParitySpec extends SparkSpec {

  private val names = Seq(
    "f2_currency_parse", "f3_lenient_cast", "f8_ratio_nan_mean",
    "f9_int_cast", "w4_train_split", "pr3_moments",
    // round-9 additions with division/element_at arithmetic that ANSI
    // treats differently when misused — parity proves they don't rely on
    // silent-null coercion either way
    "sim_lsh_recall", "pr8_frequent", "txt_pack_sequences",
    "dd_span_dedup", "w12_temperature_mix",
    // round-9 second batch: jaccard/cdf/score divisions and quantile
    // arithmetic
    "dd_decontaminate_fuzzy", "a11_ks_drift", "pipe_token_budget",
    "txt_ppl_buckets")

  test("cleaning queries produce identical rows with ANSI on and off") {
    val dir = "/root/testdata/sf0.001"
    def run(): Map[String, Seq[Seq[Any]]] = names.map { n =>
      n -> SparkEntry.queries(n)(spark, dir)
        .collect().map(_.toSeq.map(String.valueOf): Seq[Any]).sortBy(_.toString).toSeq
    }.toMap
    assert(spark.conf.get("spark.sql.ansi.enabled") === "true") // Spark 4 default
    val ansiOn = run()
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val ansiOff = run()
      names.foreach { n =>
        assert(ansiOn(n) === ansiOff(n), s"$n differs between ANSI modes")
        assert(ansiOn(n).nonEmpty, s"$n returned no rows")
      }
    } finally spark.conf.set("spark.sql.ansi.enabled", "true")
  }
}
