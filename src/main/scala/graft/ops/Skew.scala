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
}
