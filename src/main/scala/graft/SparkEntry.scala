package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{ExtensionQueries, RelationalQueries}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("a1_groupby_mean")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline
    * extensions over documents/embeddings/events). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ ExtensionQueries.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Bucketed/quantized-approximation ops
    * (dd_minhash_lsh, dd_simhash, sim_lsh_ann, sim_pq_topk) are rows-only:
    * their output is defined by the bucketing/codebooks, so they are
    * verified by planted-duplicate / exact-recovery ScalaTest checks —
    * AND each has an exactness-pinned oracle twin that closes the loop in
    * SQL (dd_minhash_verified, dd_simhash_exact, sim_lsh_exact,
    * sim_pq_exact: guaranteed-recall / universal-bucket / grid-recovery
    * parameterizations of the same operators). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ ExtensionQueries.oracle
}
