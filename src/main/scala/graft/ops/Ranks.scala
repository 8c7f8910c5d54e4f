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
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
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

  /** Exact INCLUSIVE prefix sums of Long `valueCols` under the total
    * order `sortCols` — each row gains `<col>_cum` = the sum of that
    * column over all rows at or before it. The distributed CDF
    * primitive (KS statistics, Gini/Lorenz curves, calibration sweeps)
    * without a single-task global window: range-exchange sort, one
    * narrow pass for per-partition subtotals (P longs to the driver),
    * offsets broadcast back, one narrow pass to emit. `sortCols` must
    * totalize (include a tie column, or pre-aggregate to distinct sort
    * keys) — with ties the split between "at" and "before" would be
    * partition-dependent.
    *
    * 100 TB shape: ONE range exchange (localCheckpoint'd so both narrow
    * passes read the same sorted partitions once), driver traffic is
    * P·|valueCols| longs.
    */
  def prefixSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols required")
    val sorted = df.orderBy(sortCols: _*).localCheckpoint()
    val idx = valueCols.map(sorted.schema.fieldIndex)
    val rdd = sorted.rdd
    val partials = rdd.mapPartitionsWithIndex { (pi, it) =>
      val sums = Array.fill(idx.length)(0L)
      it.foreach { r =>
        var j = 0
        while (j < idx.length) {
          if (!r.isNullAt(idx(j))) sums(j) += r.getLong(idx(j))
          j += 1
        }
      }
      Iterator((pi, sums))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(Array.fill(idx.length)(0L)) { (acc, p) =>
      acc.zip(p).map { case (a, b) => a + b }
    }.init
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields ++
      valueCols.map(c => StructField(s"${c}_cum", LongType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (pi, it) =>
      val run = bc.value(pi).clone()
      it.map { r =>
        var j = 0
        while (j < idx.length) {
          if (!r.isNullAt(idx(j))) run(j) += r.getLong(idx(j))
          j += 1
        }
        // toList COPIES the running array — toSeq would wrap the mutable
        // buffer and corrupt already-emitted rows on the next update
        Row.fromSeq(r.toSeq ++ run.toList)
      }
    }
    df.sparkSession.createDataFrame(out, outSchema)
  }
}
