package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew remedies for when AQE's runtime skew-join split isn't
  * available or isn't enough — the action side of the [[graft.Queries]]
  * hot-key report (q112): diagnose there, salt here.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a deterministic salt
    * in `[0, salt)` hashed from its whole row, the small side is
    * replicated `salt` times, and the join runs on `keys :+ salt` — each
    * hot key's rows spread over `salt` reducers instead of one straggler
    * task. The result is EXACTLY the plain join (salting only re-routes
    * rows); `joinType` may be `inner` or `left` (the replicated side
    * must be the non-preserved one, so right/full are rejected).
    *
    * Cost model: small side shuffles ×`salt` — worth it when one key
    * holds ≫ 1/`salt` of the big side, pointless otherwise. Diagnose
    * with the hot-key report first; typical salt 8–64.
    *
    * 100 TB shape: one shuffle of each side on (keys, salt); no
    * broadcast (use a broadcast join outright if the small side fits),
    * no AQE dependence, deterministic salt (row-hash) so retries
    * re-route identically.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt >= 2, s"salt $salt must be >= 2 (1 is a plain join)")
    require(Seq("inner", "left").contains(joinType),
      s"joinType $joinType not supported: the small side is replicated, " +
        "so only inner/left (big side preserved) keep plain-join semantics")
    require(keys.nonEmpty, "saltedJoin needs join keys")
    val bigCols = big.columns.toSeq
    val b = big.withColumn("__salt",
      pmod(hash(bigCols.map(col): _*), lit(salt)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Plan a BALANCED range partitioning for a sorted/clustered write:
    * exact nearest-rank boundaries at global positions ⌈i·N/p⌉
    * (i = 1..p−1) over the (value, tie) total order, then the audit —
    * how many rows each planned partition actually receives. This is
    * the TeraSort/partitioned-write planning primitive with EXACT
    * boundaries instead of Spark's sampled ones: sampling is fine for
    * an ad-hoc sort, not for a published table layout that readers
    * assume balanced (a 2× over-full partition becomes the one straggler
    * file every downstream scan waits on). Returns one row per
    * partition: `(partition_id, upper_value, upper_tie, n_rows)` —
    * `upper_*` NULL for the last (unbounded) partition; a row belongs to
    * partition i when its (value, tie) is ≤ boundary i and > boundary
    * i−1.
    *
    * 100 TB shape: boundaries rank only the two sort columns
    * ([[Ranks.orderStatistics]] — range exchange on a pruned scan), the
    * p−1 boundary rows broadcast, and assignment is one codegen'd
    * comparison fold per row into a map-side-combined count by
    * partition id. The corpus never shuffles.
    */
  /** Exact nearest-rank boundaries at positions ⌈i·N/p⌉, i = 1..p−1,
    * collected (p−1 rows — model-sized, the k-means precedent).
    */
  private def exactBounds(
      base: DataFrame,
      valueCol: String,
      tieCol: String,
      p: Int): Array[org.apache.spark.sql.Row] = {
    val n = base.agg(count(lit(1))).head.getLong(0)
    val positions = (1 until p).map(i => (i.toLong * n + p - 1) / p)
      .filter(q => q >= 1 && q <= n).distinct
    Ranks.orderStatistics(base, Seq(valueCol, tieCol), positions)
      .select(col("position"), col(valueCol).as("bv"), col(tieCol).as("bt"))
      .orderBy("position")
      .collect()
  }

  /** The partition id of each row under collected `bounds`: partition i
    * when (value, tie) ≤ boundary i and > boundary i−1; everything past
    * the last boundary lands in partition `bounds.length`.
    */
  private def pidExpr(
      bounds: Array[org.apache.spark.sql.Row],
      valueCol: String,
      tieCol: String): org.apache.spark.sql.Column =
    // foldLeft nests each new `when` OUTSIDE the accumulator, so iterate
    // largest-boundary-first to make the final expression test the
    // SMALLEST boundary first (first true when wins).
    bounds.zipWithIndex.reverse.foldLeft(lit(bounds.length): org.apache.spark.sql.Column) {
      case (acc, (b, i)) =>
        val bv = lit(b.get(1))
        val bt = lit(b.get(2))
        when(col(valueCol) < bv ||
          (col(valueCol) === bv && col(tieCol) <= bt), lit(i)).otherwise(acc)
    }

  def rangePartitionPlan(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      p: Int): DataFrame = {
    require(p >= 2, s"p $p must be >= 2")
    val base = df.filter(col(valueCol).isNotNull)
    val bounds = exactBounds(base, valueCol, tieCol, p)
    val counts = base
      .withColumn("partition_id", pidExpr(bounds, valueCol, tieCol).cast("int"))
      .groupBy("partition_id").agg(count(lit(1)).as("n_rows"))
    val boundRows = bounds.zipWithIndex.map { case (b, i) => (i, b.get(1), b.get(2)) }
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("partition_id", IntegerType, nullable = false),
      StructField("upper_value", df.schema(valueCol).dataType, nullable = true),
      StructField("upper_tie", df.schema(tieCol).dataType, nullable = true)))
    val boundDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        boundRows.map { case (i, v, t) => Row(i, v, t) } :+
          Row(bounds.length, null, null), 1),
      schema)
    boundDf.join(counts, Seq("partition_id"), "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))
  }

  /** EXECUTE the plan: write `df` as exactly `p` sorted, range-disjoint,
    * size-balanced files — the clustered table layout downstream scans
    * range-prune against. Uses [[exactBounds]] + an explicit
    * pid-identity `Partitioner` (routing is exact, not hash — two pids
    * must never share a file, or the file's min/max range lies), then a
    * per-partition sort and one file per partition via
    * `maxRecordsPerFile`-free single-task writes. Rows with a NULL
    * value route to partition 0 (Spark's nulls-first order) rather than
    * silently vanishing — the compactWrite null lesson.
    *
    * 100 TB shape: one boundary pass (pruned 2-column rank) + ONE exact
    * shuffle of the corpus into p balanced tasks, each sorting its own
    * range — TeraSort's write phase. The balance guarantee is what the
    * sampled `repartitionByRange` cannot give a published layout.
    */
  def plannedRangeWrite(
      df: DataFrame,
      valueCol: String,
      tieCol: String,
      p: Int,
      path: String,
      format: String = "parquet"): Unit = {
    require(p >= 2, s"p $p must be >= 2")
    val base = df.filter(col(valueCol).isNotNull)
    val bounds = exactBounds(base, valueCol, tieCol, p)
    val assigned = df.withColumn("__pid",
      when(col(valueCol).isNull, lit(0))
        .otherwise(pidExpr(bounds, valueCol, tieCol)).cast("int"))
    val pidIdx = assigned.schema.fieldIndex("__pid")
    val numParts = bounds.length + 1
    val routed = assigned.rdd
      .map(r => (r.getInt(pidIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = numParts
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    df.sparkSession.createDataFrame(routed, assigned.schema)
      .sortWithinPartitions(col(valueCol), col(tieCol))
      .drop("__pid")
      .write.mode("overwrite").format(format).save(path)
  }
}
