package graft
import org.apache.spark.sql.SparkSession
/** Driver-conditions smoke check: runs [[SparkEntry.entry]] with a BARE
  * SparkSession (no graft-specific config), exactly as the driver does.
  * Catches accidental dependencies on session config (e.g. parquet reader
  * flags) that Verify/Bench set for themselves.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"ENTRY_ROWS=$n")
    df.show(5, truncate = false)
    serve(spark)
    spark.stop()
  }

  /** Drives the materialize → online-serve path end-to-end: customers into
    * the in-process store, then per-request lookups + a serving-path
    * expression — no manual key registration.
    */
  private def serve(spark: SparkSession): Unit = {
    import graft.client.GraftClient
    import graft.table._
    val cl = new GraftClient(spark)
    val cust = FileSource(
      "smoke_cust", "/root/testdata/sf0.001/customer.parquet", "parquet",
      keys = Some(Seq("c_custkey")))
    cl.materialize(cust, MemoryStoreSink("smoke_cust_online"))
    val served = cl.getOnlineFeatures(
      Seq(Map("c_custkey" -> 1L), Map("c_custkey" -> 2L), Map("c_custkey" -> 999999L)),
      "smoke_cust_online",
      lookupFeatures = Seq("c_name", "c_acctbal"),
      exprFeatures = Seq(("bal_2x", "c_acctbal * 2")))
    println(s"SERVED=${served.mkString(" | ")}")
  }
}
