package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Named-query serving surface — the engine-side analog of the reference's
  * `POST /get_data {table, limit}` API (finalprojectapi.py:17-37).
  *
  * The reference assembles SQL by string concatenation
  * (finalprojectapi.py:24 — injection-prone); here table access goes
  * through an explicit registry (whitelist) and the limit is a typed int:
  * no string SQL is ever assembled from user input.
  *
  * Rows are returned in a deterministic order (the registry's declared sort
  * keys) rather than storage heap order — SURVEY §7.4's determinism rule. */
final class QueryService(tables: Map[String, () => DataFrame],
                         sortKeys: Map[String, Seq[String]] = Map.empty) {

  def tableNames: Set[String] = tables.keySet

  /** The `{table, limit}` query: whitelisted lookup, deterministic order,
    * bounded rows. Unknown table → IllegalArgumentException (the analog of
    * the API's error path).
    *
    * Determinism holds even when the declared sort keys are NOT a unique
    * key: the remaining columns are appended as tiebreakers, so
    * orderBy + limit never returns an arbitrary subset of tied rows
    * (which partitioning or AQE could otherwise reorder between calls). */
  def getData(table: String, limit: Int): DataFrame = {
    require(limit >= 0, s"limit must be >= 0, got $limit")
    val df = tables.getOrElse(table,
      throw new IllegalArgumentException(
        s"unknown table '$table'; known: ${tables.keys.toSeq.sorted.mkString(", ")}"))
      .apply()
    val sorted = sortKeys.get(table).filter(_.nonEmpty)
      .map { ks =>
        val tiebreak = df.columns.filterNot(ks.contains)
        df.orderBy((ks ++ tiebreak).map(df(_)): _*)
      }
      .getOrElse(df)
    sorted.limit(limit)
  }
}

object QueryService {
  /** Registry over a directory of parquet tables (the post-ETL serving
    * layout). Lazy: each table is read on first request, limit/projection
    * pushdown applies per query. */
  def overParquetDir(spark: SparkSession, dir: String, names: Seq[String],
                     sortKeys: Map[String, Seq[String]] = Map.empty): QueryService =
    new QueryService(
      names.map(n => n -> (() => spark.read.parquet(s"$dir/$n.parquet"))).toMap,
      sortKeys)
}
