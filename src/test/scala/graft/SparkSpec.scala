package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM-wide session — Spark
  * startup dominates test wall time otherwise). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Walk an EXECUTED physical plan through every AQE wrapper: both
    * `AdaptiveSparkPlanExec` and the `QueryStageExec` family
    * (Shuffle/Broadcast/ResultQueryStage) are LEAF nodes whose real
    * subtree hangs off a field, not `children` — a naive walker sees
    * only the wrapper and makes any exists/isEmpty assertion on plan
    * nodes silently vacuous. ONE shared implementation so a new wrapper
    * node gets fixed in one place. */
  def allPlanNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      a +: allPlanNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      q +: allPlanNodes(q.plan)
    case other => other +: other.children.flatMap(allPlanNodes)
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
