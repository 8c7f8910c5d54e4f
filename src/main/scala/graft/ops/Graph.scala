package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation over plain edge DataFrames — the
  * link-analysis layer a crawl-curation pipeline uses for host/page
  * authority signals (PageRank-family centrality is a standard
  * quality prior for web-scale corpus filtering).
  *
  * Scale shape: Pregel-style synchronous iterations. Each iteration is
  * exactly ONE data shuffle (contributions grouped by destination); the
  * edge list and out-degree table are checkpointed once and reused, the
  * dangling-mass term is a one-row aggregate broadcast into the update,
  * and each iteration's ranks are eagerly checkpointed so lineage stays
  * flat across iterations (no exponential plan growth).
  *
  * All arithmetic is exact integer micro-units (1 rank = 1e12), with
  * floor division at every step — ranks are identical regardless of
  * partitioning, aggregation order, or engine, so a SQL replay
  * hash-matches bit-for-bit. Everything is non-negative, which keeps
  * Spark's truncating `div` and DuckDB's flooring `//` in agreement.
  */
object Graph {

  /** Unit of rank mass: 1.0 == 1e12 micro-units. */
  val RankUnit: Long = 1000000000000L

  /** PageRank with `iters` synchronous power iterations at damping
    * (100-resetPct)%. Edges are deduplicated (simple directed graph);
    * nodes = src ∪ dst; dangling mass (nodes with no out-edges)
    * redistributes uniformly each iteration, per the standard
    * formulation.
    *
    * Returns (node, rank_micro): integer micro-unit ranks. Total mass is
    * conserved up to the per-node floor-division remainders (identical
    * in any replay).
    */
  def pageRank(
      edges0: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      resetPct: Int = 15): DataFrame = {
    require(iters >= 1, "iters >= 1")
    require(resetPct >= 0 && resetPct <= 100, "resetPct in [0, 100]")
    val dampPct = 100 - resetPct

    val edges = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint()

    val n = nodes.count()
    require(n > 0, "graph has no nodes")
    val init = RankUnit / n
    val base = init * resetPct / 100

    var ranks = nodes.withColumn("r", lit(init))
    for (_ <- 1 to iters) {
      // one-row dangling mass: rank held by nodes with no out-edges
      val dangling = ranks
        .join(deg, ranks("node") === deg("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0L)).as("dm"))
      // the iteration's single shuffle: per-destination contribution sum
      val inflow = edges
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("node"), expr("r div outdeg").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      ranks = nodes
        .join(inflow, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(
          col("node"),
          (lit(base) +
            expr(s"coalesce(inflow, CAST(0 AS BIGINT)) * $dampPct div 100") +
            expr(s"(dm div $n) * $dampPct div 100")).as("r"))
        .localCheckpoint()
    }
    ranks.select(col("node"), col("r").as("rank_micro"))
  }
}
