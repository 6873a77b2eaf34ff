package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Graph centrality over edge-list DataFrames — the link-authority
  * signals a training-data pipeline ranks sources and curates crawl
  * frontiers by (PageRank: Brin & Page 1998, "The Anatomy of a
  * Large-Scale Hypertextual Web Search Engine", public).
  *
  * Design constraints, in order:
  *
  *   1. INTEGER-EXACT ARITHMETIC. The float formulation's per-node sum
  *      Σ r(u)/outdeg(u) is order-dependent in IEEE doubles — not
  *      hash-portable across engines, and not even run-to-run stable
  *      under a different shuffle partitioning. Here every rank is a
  *      BIGINT number of "mass units" (`scale` units = rank 1.0), every
  *      share is a floor division, and every combine is an integer sum —
  *      associative, commutative, exact. The result replays in ANSI SQL
  *      (a 5-iteration unrolled CTE chain) bit-for-bit. The floor
  *      truncation loses < 1 unit per (node, iteration) — at the default
  *      scale of 1e9 that is a relative error < n·iters/1e9, far below
  *      ranking resolution.
  *   2. SPARK-NATIVE ITERATION. Each power-iteration step is one
  *      shuffle join (ranks ⋈ edges on src) + one aggregate (sum by dst)
  *      — the Pregel message-passing shape expressed declaratively, so
  *      Catalyst/AQE handle partitioning and skew. A fixed, small
  *      iteration count keeps the unrolled plan shallow; production runs
  *      on 100 TB graphs would checkpoint ranks between iterations
  *      (break lineage), which callers can do by persisting the returned
  *      frame and re-entering with `ranksInit`.
  *   3. EXPLICIT SEMANTICS for the classic corner cases: parallel edges
  *      collapse (the edge set is DISTINCT), self-loops drop, and
  *      DANGLING mass (nodes with no out-edges) is dropped rather than
  *      redistributed — the variant used by the original paper's
  *      formulation; totals therefore shrink with dangling mass, which
  *      only rescales (never reorders) the surviving ranks under a
  *      uniform teleport.
  */
object Graph {

  /** Integer-exact PageRank after `iterations` power steps.
    *
    * rank_0(v) = scale;
    * rank_{i+1}(v) = ((dampDen − dampNum)·scale) DIV dampDen
    *               + (dampNum · Σ_{u→v} (rank_i(u) DIV outdeg(u))) DIV dampDen.
    *
    * Returns (node BIGINT, rank BIGINT). Overflow headroom: the damped
    * sum is bounded by dampNum · n · scale, so with the default
    * scale = 1e9 the arithmetic stays inside BIGINT to ~1e8 nodes;
    * larger graphs lower `scale`. */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iterations: Int = 5, scale: Long = 1000000000L,
                  dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum > 0 && dampNum < dampDen,
      s"damping must satisfy 0 < dampNum < dampDen, got $dampNum/$dampDen")
    require(scale >= dampDen, s"scale must be >= dampDen, got $scale")
    val teleport = ((dampDen - dampNum) * scale) / dampDen

    // The edge set, node set and out-degrees are LOOP INVARIANTS every
    // iteration re-reads — left lazy, the unrolled plan re-derives the
    // (possibly expensive) upstream edge projection 2·iterations times.
    // Persist them, materialize the node-sized result once through the
    // cache, release them (the Caching residency contract). The returned
    // ranks frame is persisted; repeated probes in one session read it.
    import org.apache.spark.storage.StorageLevel
    val e = edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // distinct edge set ⇒ outdeg is a plain count per src
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("__outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    graft.util.Caching.releasingOnFailure(e, nodes, outdeg) {
      var ranks = nodes.withColumn("rank", lit(scale))
      for (_ <- 1 to iterations) {
        val contrib = e
          .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
          .join(outdeg, Seq("src"))
          .select(col("dst").as("node"),
            expr("rank DIV __outdeg").as("__share"))
          .groupBy("node").agg(sum(col("__share")).as("__in"))
        ranks = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"),
            (lit(teleport) +
              expr(s"($dampNum * coalesce(__in, 0L)) DIV $dampDen"))
              .cast(LongType).as("rank"))
      }
      graft.util.Caching.materializeAndRelease(ranks, e, nodes, outdeg)
    }
  }

  /** The unrolled ANSI-SQL replay of [[pageRankInt]] — the oracle text
    * generator, kept NEXT TO the engine code so the two formulations
    * cannot drift apart silently. `edgeSql` must yield (src, dst) BIGINT
    * columns (deduplication and self-loop removal are applied here). */
  def pageRankIntSql(edgeSql: String, iterations: Int = 5,
                     scale: Long = 1000000000L, dampNum: Long = 85L,
                     dampDen: Long = 100L): String = {
    val teleport = ((dampDen - dampNum) * scale) / dampDen
    val steps = (1 to iterations).map { i =>
      s"""r$i AS (SELECT n.node,
         |  CAST($teleport + ($dampNum * COALESCE(s.c, 0)) // $dampDen
         |    AS BIGINT) AS rank
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, SUM(r.rank // od.outdeg) AS c
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |    JOIN od ON e.src = od.src GROUP BY 1) s ON n.node = s.node)"""
        .stripMargin
    }
    s"""WITH raw_e AS ($edgeSql),
       |e AS (SELECT DISTINCT CAST(src AS BIGINT) AS src,
       |    CAST(dst AS BIGINT) AS dst FROM raw_e
       |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       |nodes AS (SELECT DISTINCT src AS node FROM e
       |  UNION SELECT DISTINCT dst FROM e),
       |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |r0 AS (SELECT node, CAST($scale AS BIGINT) AS rank FROM nodes),
       |${steps.mkString(",\n")}
       |SELECT node, rank FROM r$iterations""".stripMargin
  }
}
