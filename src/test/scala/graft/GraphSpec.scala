package graft

import graft.ops.Graph
import org.apache.spark.sql.functions._

/** Unit checks for the exact-integer PageRank operator: a hand-replayed
  * 4-node graph, dangling-mass redistribution, mass conservation up to
  * floor-division remainders, and determinism under repartitioning.
  */
class GraphSpec extends SparkSuite {

  /** 1→2, 1→3, 2→3, 3→1 plus dangling node 4 (3→4 gives it in-flow but
    * it has no out-edges, so its whole rank is dangling mass).
    */
  private lazy val edges = {
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
  }

  /** Reference replay of Graph.pageRank's exact integer recurrence in
    * plain Scala (Long floor division at each step, same order).
    */
  private def replay(
      edges: Seq[(Long, Long)], iters: Int, resetPct: Int): Map[Long, Long] = {
    val dampPct = 100 - resetPct
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val init = Graph.RankUnit / n
    val base = init * resetPct / 100
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filterNot(outdeg.contains).map(r).sum
      val inflow = edges
        .map { case (s, d) => d -> r(s) / outdeg(s) }
        .groupBy(_._1).map { case (d, cs) => d -> cs.map(_._2).sum }
      r = nodes.map { nd =>
        nd -> (base + inflow.getOrElse(nd, 0L) * dampPct / 100 + (dm / n) * dampPct / 100)
      }.toMap
    }
    r
  }

  test("pageRank matches the exact-integer scalar replay") {
    val got = Graph.pageRank(edges, "s", "d", iters = 4)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    val want = replay(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (3L, 4L)), 4, 15)
    assert(got == want)
    // node 3 has two in-links (one from the hub 1) -> highest rank;
    // the dangling leaf 4 gets only 1/3 of 3's rank plus redistribution.
    assert(got(3L) == got.values.max)
    assert(got(4L) < got(3L))
  }

  test("mass is conserved up to floor-division remainders") {
    val ranks = Graph.pageRank(edges, "s", "d", iters = 3)
      .agg(sum("rank_micro")).collect()(0).getLong(0)
    // each of the 4 nodes loses < 3 micro-units per iteration to the three
    // floor divisions; total drift is bounded far below 0.1% of the unit
    assert(ranks <= Graph.RankUnit)
    assert(ranks > Graph.RankUnit - Graph.RankUnit / 1000)
  }

  test("result is invariant to input partitioning and duplicate edges") {
    val base = Graph.pageRank(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val shuffled = Graph.pageRank(
      edges.union(edges).repartition(7), "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(base == shuffled)
  }

  test("all-dangling graph degenerates to uniform redistribution") {
    val spark2 = spark
    import spark2.implicits._
    // single edge, then only node 2 remains a source of dangling mass:
    // with one edge 1->2, node 2 is dangling
    val one = Seq((1L, 2L)).toDF("s", "d")
    val got = Graph.pageRank(one, "s", "d", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = replay(Seq((1L, 2L)), 1, 15)
    assert(got == want)
  }
}
