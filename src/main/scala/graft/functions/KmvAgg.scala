package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Sorted ascending, distinct, at most k hashes — the mergeable KMV state. */
final case class KmvBuf(hashes: Seq[String])

/** (k, kept, k-th hash or null, estimate) — same estimator contract as
  * [[graft.ops.Sketch.distinctSketch]].
  */
final case class KmvResult(k: Int, n_kept: Long, kth_hash: String, est_distinct: Long)

/** KMV distinct sketch as a typed [[Aggregator]] — the MERGEABLE form of
  * [[graft.ops.Sketch.distinctSketch]]: because an Aggregator has
  * reduce/merge, Spark runs it with MAP-SIDE PARTIAL AGGREGATION, so each
  * task ships at most k hashes per group instead of every distinct
  * (group, hash) row the window formulation shuffles. Same md5 hash
  * space and the same exact-integer estimator, so both formulations
  * return identical rows (q62 locks the window one, q124 locks this one
  * against the same oracle).
  *
  * Being an Aggregator also makes it STREAMABLE: `udaf(new KmvAgg(k))`
  * drops into a watermarked `groupBy(window(...))` aggregation for
  * per-window approximate cardinality on an unbounded stream with O(k)
  * state per window — the thing an exact countDistinct cannot do
  * unboundedly (StreamingSpec exercises exactly that).
  *
  * NULL inputs are ignored (count-distinct semantics, matching
  * distinctSketch's documented rule).
  */
class KmvAgg(k: Int) extends Aggregator[String, KmvBuf, KmvResult] {
  require(k >= 2, s"k $k must be >= 2")

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    String.format("%032x", new java.math.BigInteger(1, d))
  }

  def zero: KmvBuf = KmvBuf(Vector.empty)

  def reduce(b: KmvBuf, value: String): KmvBuf = {
    if (value == null) b
    else {
      val h = md5hex(value)
      val v = b.hashes
      // fast path: sketch saturated and h at or beyond the k-th hash
      if (v.size == k && h >= v.last) b
      else if (v.contains(h)) b
      else KmvBuf(((v :+ h).sorted: Seq[String]).take(k))
    }
  }

  def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf =
    KmvBuf(((b1.hashes ++ b2.hashes).distinct.sorted: Seq[String]).take(k))

  def finish(b: KmvBuf): KmvResult = {
    val n = b.hashes.size.toLong
    if (n < k) KmvResult(k, n, null, n)
    else {
      val kth = b.hashes.last
      val u32 = java.lang.Long.parseLong(kth.substring(0, 8), 16)
      val est = math.round((k - 1).toDouble * 4294967296.0 / (u32.toDouble + 1.0))
      KmvResult(k, n, kth, est)
    }
  }

  def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  def outputEncoder: Encoder[KmvResult] = Encoders.product[KmvResult]
}

object KmvAgg {
  /** Column-function form: `df.groupBy(g).agg(KmvAgg.kmv(64)(col))`. */
  def kmv(k: Int): Column => Column = {
    val f = udaf(new KmvAgg(k))
    (c: Column) => f(c)
  }
}
