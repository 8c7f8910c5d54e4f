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
}
