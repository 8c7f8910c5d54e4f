package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus management: what changed between two
  * crawls/ingests of the same collection. Feeding only `added`/`changed`
  * docs into the expensive downstream passes (dedup, quality, embedding)
  * is the difference between reprocessing 100 TB per crawl and
  * reprocessing the delta.
  */
object Corpus {

  /** Row-level diff of two snapshots by id: `unchanged` (same id, same
    * normalized text), `changed` (same id, different text), `added` (only
    * in `cur`), `removed` (only in `old`). Content comparison uses
    * [[TextOps.normalizedHash]], so whitespace/punctuation-only edits
    * count as unchanged.
    *
    * 100 TB shape: each side reduces to (id, hash) map-side before the
    * one full-outer equi-join shuffle on the id; the text itself never
    * shuffles. Output carries the id and status only — join it back to
    * whichever side a consumer needs (the delta is usually tiny, so that
    * join-back broadcasts).
    */
  def diff(
      old: DataFrame,
      cur: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // presence is tracked explicitly, NOT via hash nullness — a NULL text
    // hashes to NULL and would otherwise fake an absent side; comparison
    // is null-safe so two NULL texts compare unchanged
    def hashed(df: DataFrame, h: String, p: String) =
      df.select(
        col(idCol).as("id"),
        TextOps.normalizedHash(col(textCol)).as(h),
        lit(true).as(p))
    hashed(old, "h_old", "in_old")
      .join(hashed(cur, "h_cur", "in_cur"), Seq("id"), "full_outer")
      .select(
        col("id"),
        when(col("in_old").isNull, lit("added"))
          .when(col("in_cur").isNull, lit("removed"))
          .when(col("h_old") <=> col("h_cur"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Compaction-aware partitioned write — the small-files control a
    * 100 TB layout needs. A plain `write.partitionBy(cols)` after a hash
    * shuffle leaves every partition directory with one file PER SHUFFLE
    * TASK (tiny files × thousands of tasks), and a `repartition(cols)`
    * leaves ONE file per directory (a single writer per partition value —
    * the skewed-partition bottleneck). This sizes files to the data: each
    * partition value gets `ceil(rows / targetRowsPerFile)` salt buckets,
    * the frame shuffles once on (partitionCols, salt), and the writer
    * emits at most that many files per directory.
    *
    * The per-partition-value count table collects to the driver — bounded
    * by the partition-value cardinality (a layout with more distinct
    * partition values than driver memory is a broken layout, not a
    * broken writer). `keyCol` salts deterministically (md5), so reruns
    * produce identical file assignment.
    *
    * NULL partition values are preserved: the count join is null-safe
    * (`<=>` per partition column), so null-keyed rows land in
    * `__HIVE_DEFAULT_PARTITION__` exactly as a plain `partitionBy` would,
    * instead of being silently dropped by a null-rejecting equi-join.
    */
  def compactWrite(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      keyCol: String,
      targetRowsPerFile: Long,
      format: String = "parquet"): Unit = {
    require(partitionCols.nonEmpty, "compactWrite requires partition columns")
    require(targetRowsPerFile > 0, s"targetRowsPerFile $targetRowsPerFile must be positive")
    val renamed = partitionCols.map(c => c -> s"__pv_$c").toMap
    val counts = df.groupBy(partitionCols.map(col): _*).count()
      .withColumn("__nf",
        ceil(col("count").cast("double") / targetRowsPerFile).cast("int"))
      .drop("count")
      .select(partitionCols.map(c => col(c).as(renamed(c))) :+ col("__nf"): _*)
    // null-safe join: rows with NULL partition values keep flowing to the
    // writer (Hive default partition) rather than vanishing
    val joinCond = partitionCols.map(c => col(c) <=> col(renamed(c))).reduce(_ && _)
    val salted = df
      .join(broadcast(counts), joinCond)
      .drop(partitionCols.map(renamed): _*)
      .withColumn("__salt",
        pmod(conv(substring(md5(coalesce(col(keyCol).cast("string"), lit(""))), 1, 8), 16, 10).cast("long"),
          col("__nf").cast("long")))
      .drop("__nf")
    salted
      .repartition((partitionCols :+ "__salt").map(col): _*)
      .drop("__salt")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", targetRowsPerFile)
      .partitionBy(partitionCols: _*)
      .format(format)
      .save(path)
  }
}
