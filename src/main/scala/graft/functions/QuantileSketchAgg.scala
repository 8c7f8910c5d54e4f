package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Aggregator input: a row's unique id (hashed for the keep/drop
  * decision) and its micro-floored value.
  */
final case class QsketchIn(id: String, v: java.lang.Long)

/** Mergeable state: exact row count + the ≤k sample entries, kept
  * sorted by hash ascending (the k smallest md5(id) seen).
  */
final case class QsketchEntry(h: String, v: Long)
final case class QsketchBuf(n: Long, entries: Seq[QsketchEntry])

/** (total rows, sample size, one micro value per requested percent —
  * empty when the group had no valid rows).
  */
final case class QsketchResult(n: Long, m: Long, q_micro: Seq[Long])

/** Deterministic mergeable quantile sketch as a typed [[Aggregator]] —
  * the streaming/mergeable complement of
  * [[graft.ops.Corpus.groupQuantiles]] (which is exact but needs a full
  * per-group rank exchange that a watermarked streaming window cannot
  * run).
  *
  * The sketch is a BOTTOM-k-BY-HASH row sample: every row is scored by
  * `md5(id)`, and the state keeps the k smallest-hash rows' values.
  * "Compaction" — which rows to discard when the buffer exceeds k — is
  * therefore entirely md5-driven: the largest-hash entries go, a choice
  * any engine replays exactly (`ORDER BY md5(id) LIMIT k` — q254's
  * DuckDB oracle does precisely this). Unlike a KLL/MRL compactor,
  * whose result depends on arrival and merge order (Spark's partial-agg
  * tree shape is nondeterministic run to run), bottom-k selection is
  * ORDER-INDEPENDENT: reduce/merge in any order yields the identical
  * sketch, which is what makes the whole aggregate engine-replayable
  * and batch/streaming bit-identical. The price is estimator variance
  * O(1/√k) typical of uniform row samples — this is a principled
  * uniform sample (each row's md5 rank is uniform), the classic
  * bottom-k sampling estimator.
  *
  * Quantiles use [[graft.ops.Corpus.groupQuantiles]]'s nearest-rank
  * convention on the sample: percent p picks the sample value at sorted
  * rank `floor(p·(m−1)/100)`. When the group has n ≤ k rows the sample
  * IS the group and the quantiles are exact.
  *
  * Contract: `id` must uniquely identify a row within the group
  * (event_id, doc_id — every table here has one). Duplicate ids
  * deterministically keep the smallest value; NULL id or value is
  * ignored (not counted in n).
  *
  * 100 TB shape: an Aggregator runs with MAP-SIDE PARTIAL AGGREGATION —
  * each task ships at most k entries per group, never the rows; state
  * is O(k) per group. Being an Aggregator also makes it STREAMABLE:
  * `udaf(new QuantileSketchAgg(k, ps))` drops into a watermarked
  * `groupBy(window(...))` for per-window quantiles on an unbounded
  * stream (QuantileSketchSpec locks streaming = batch bit-parity).
  */
class QuantileSketchAgg(k: Int, percents: Seq[Int])
    extends Aggregator[QsketchIn, QsketchBuf, QsketchResult] {
  require(k >= 2, s"k $k must be >= 2")
  require(percents.nonEmpty && percents.forall(p => p >= 0 && p <= 100),
    s"percents $percents must be in [0,100]")

  private val ps: Seq[Int] = percents.toVector

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    String.format("%032x", new java.math.BigInteger(1, d))
  }

  def zero: QsketchBuf = QsketchBuf(0L, Vector.empty)

  def reduce(b: QsketchBuf, in: QsketchIn): QsketchBuf = {
    if (in.id == null || in.v == null) b
    else {
      val h = md5hex(in.id)
      val cur = b.entries
      // binary search in the h-sorted buffer: lo = first index with
      // hash >= h (insertion point). The common saturated-miss case
      // (lo == k) is O(log k) with zero allocation; a hit or insert
      // pays one O(k) vector patch, never a re-sort.
      var lo = 0
      var hi = cur.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cur(mid).h < h) lo = mid + 1 else hi = mid
      }
      val entries =
        if (lo < cur.size && cur(lo).h == h) {
          // duplicate id: keep the min value
          if (in.v < cur(lo).v) cur.updated(lo, QsketchEntry(h, in.v))
          else cur
        } else if (cur.size == k && lo == k) cur // beyond the k smallest
        else cur.patch(lo, Seq(QsketchEntry(h, in.v)), 0).take(k)
      QsketchBuf(b.n + 1, entries)
    }
  }

  def merge(b1: QsketchBuf, b2: QsketchBuf): QsketchBuf = {
    val merged = (b1.entries ++ b2.entries)
      .groupBy(_.h).view.mapValues(_.map(_.v).min)
      .map { case (h, v) => QsketchEntry(h, v) }
      .toSeq.sortBy(_.h).take(k)
    QsketchBuf(b1.n + b2.n, merged)
  }

  def finish(b: QsketchBuf): QsketchResult = {
    val m = b.entries.size
    if (m == 0) QsketchResult(b.n, 0L, Vector.empty)
    else {
      val byValue = b.entries.map(_.v).sorted
      QsketchResult(b.n, m.toLong,
        ps.map(p => byValue((p.toLong * (m - 1) / 100L).toInt)))
    }
  }

  def bufferEncoder: Encoder[QsketchBuf] = Encoders.product[QsketchBuf]
  def outputEncoder: Encoder[QsketchResult] = Encoders.product[QsketchResult]
}

object QuantileSketchAgg {
  /** Column-function form:
    * `df.groupBy(g).agg(QuantileSketchAgg.qsketch(64, Seq(50, 90))(idCol, vCol))`.
    */
  def qsketch(k: Int, percents: Seq[Int]): (Column, Column) => Column = {
    val f = udaf(new QuantileSketchAgg(k, percents))
    (id: Column, v: Column) => f(id, v)
  }
}
