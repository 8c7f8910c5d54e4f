package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Exact global order statistics without a single-partition window.
  *
  * A keyless `ROW_NUMBER() OVER (ORDER BY …)` collapses the table onto
  * one task — the documented scale trap of global windows (SCALE.md).
  * These helpers get the same answers the distributed way: a range
  * exchange (Spark's `orderBy`) keeps every partition sorted and
  * disjoint, then per-partition offsets turn local positions into exact
  * global ranks. That is the TeraSort indexing scheme, and it is how a
  * 100 TB table gets ranked on a 1000-executor cluster.
  */
object Ranks {

  /** Attach the exact 1-based global rank of every row under the TOTAL
    * order `sortCols` (callers must include a tie-breaking unique column
    * so the rank — and everything derived from it — is deterministic
    * under any partitioning).
    *
    * 100 TB shape: ONE range exchange (`orderBy`), then
    * `zipWithIndex`'s narrow count pass + offset add. No data ever
    * gathers on one task; partition balance comes from Spark's range
    * partitioner sampling.
    */
  def globalRank(df: DataFrame, sortCols: Seq[Column], rankCol: String = "rank"): DataFrame = {
    require(sortCols.nonEmpty, "sortCols required")
    val sorted = df.orderBy(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** The values sitting at the given 1-based global `positions` of the
    * total order `sortCols` — exact nearest-rank order statistics
    * (`position, value columns…`). Positions out of [1, N] yield no row.
    *
    * 100 TB shape: rank only the SORT columns (column-pruned scan), then
    * a filter on the rank — the result is |positions|-sized.
    */
  def orderStatistics(
      df: DataFrame,
      sortCols: Seq[String],
      positions: Seq[Long]): DataFrame = {
    require(positions.nonEmpty, "positions required")
    val ranked = globalRank(df.select(sortCols.map(col): _*), sortCols.map(col), "__pos")
    ranked.filter(col("__pos").isin(positions: _*))
      .withColumnRenamed("__pos", "position")
      .select(col("position") +: sortCols.map(col): _*)
  }
}
