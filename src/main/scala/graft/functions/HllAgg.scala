package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** 256 register maxima (rho values, 0 = untouched register). */
final case class HllBuf(regs: Seq[Int])

/** (zero registers, Σ2^(49−M_j) as an exact integer, estimate). */
final case class HllResult(n_zero_regs: Long, s49: Long, est_distinct: Long)

/** HyperLogLog distinct sketch as a typed [[Aggregator]] — the
  * industry-standard cardinality estimator (Flajolet et al. 2007) in
  * its md5-deterministic, ORDER-INDEPENDENT form: register j keeps the
  * max rho ever seen, and max is commutative/associative/idempotent, so
  * any reduce/merge tree — and any engine — produces the identical 256
  * registers. Complements [[KmvAgg]]: KMV keeps k hashes (exact until
  * saturation, k·16 bytes), HLL keeps 256 small integers (~2 kB fixed)
  * with ~6.5% standard error at ANY cardinality — the sketch for
  * billions of distincts per group.
  *
  * Hash layout (p = 8, fixed so the oracle's hex arithmetic aligns on
  * digit boundaries): register = first md5 byte (2 hex digits), rho =
  * 1 + leading-zero-bits of the NEXT 48 bits (12 hex digits), rho = 49
  * when they are all zero. The oracle replays rho with pure string
  * ops — count leading '0' hex digits, then a 4-way CASE on the first
  * nonzero digit — no float log2 anywhere (exact at power-of-two
  * boundaries where an ln-based bit count flips).
  *
  * Estimator: `Σ 2^(49−M_j)` is an EXACT int64 (≤ 256·2⁴⁹ = 2⁵⁷),
  * exposed as `s49`; the raw estimate
  * `α₂₅₆·256²·2⁴⁹ / s49` and the small-range linear-counting branch
  * `256·ln(256/V)` (taken when raw ≤ 2.5·256 and V > 0) are single
  * fixed double trees of exact integers, floored once — mirrored
  * token-for-token by the q261 oracle. NULL inputs are ignored.
  *
  * 100 TB shape: map-side partial aggregation ships one 256-int buffer
  * per group per task; state is O(1) per group regardless of
  * cardinality, and the same udaf drops into watermarked streaming
  * windows (the [[KmvAgg]] pattern).
  */
class HllAgg extends Aggregator[String, HllBuf, HllResult] {
  private val M = 256

  def zero: HllBuf = HllBuf(Vector.fill(M)(0))

  private def regRho(value: String): (Int, Int) = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val reg = d(0) & 0xff
    // next 48 bits: bytes 1..6
    var w = 0L
    var i = 1
    while (i <= 6) { w = (w << 8) | (d(i) & 0xffL); i += 1 }
    val rho = if (w == 0L) 49 else java.lang.Long.numberOfLeadingZeros(w) - 16 + 1
    (reg, rho)
  }

  def reduce(b: HllBuf, value: String): HllBuf = {
    if (value == null) b
    else {
      val (reg, rho) = regRho(value)
      if (rho <= b.regs(reg)) b else HllBuf(b.regs.updated(reg, rho))
    }
  }

  def merge(b1: HllBuf, b2: HllBuf): HllBuf =
    HllBuf(Vector.tabulate(M)(j => math.max(b1.regs(j), b2.regs(j))))

  def finish(b: HllBuf): HllResult = {
    val v = b.regs.count(_ == 0).toLong
    var s49 = 0L
    b.regs.foreach(r => s49 += 1L << (49 - r))
    // the SAME double tree the oracle writes, token for token
    val raw = (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0 *
      562949953421312.0 / s49.toDouble
    val est =
      if (raw <= 640.0 && v > 0)
        math.floor(256.0 * math.log(256.0 / v)).toLong
      else math.floor(raw).toLong
    HllResult(v, s49, est)
  }

  def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
  def outputEncoder: Encoder[HllResult] = Encoders.product[HllResult]
}

object HllAgg {
  /** Column-function form: `df.groupBy(g).agg(HllAgg.hll(col))`. */
  lazy val hll: Column => Column = {
    val f = udaf(new HllAgg)
    (c: Column) => f(c)
  }
}
