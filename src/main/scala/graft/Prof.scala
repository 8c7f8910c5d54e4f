package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
/** Ad-hoc stage profiler for the dedup hotspots (dev aid). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", SparkEnv.localDir)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%6.2fs  rows=$n")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup")(spark.range(100000).count())
    time("scan")(docs.count())
    val sh = graft.ops.Dedup.wordShingles(docs, "doc_id", "text", 3)
    time("shingles")(sh.count())
    time("shingles again")(sh.count())
    val kept = sh.withColumn("df", count(lit(1)).over(Window.partitionBy(col("shingle")))).filter(col("df") <= 10000).drop("df")
    time("kept(window df)")(kept.count())
    val common = kept.as("a").join(kept.as("b"), col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b")).agg(count(lit(1)).as("common"))
    time("self-join+group")(common.count())
    time("full q21")(graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    val sigs = graft.ops.Dedup.minhashSignatures(sh, 16)
    time("signatures")(sigs.count())
    val bands = graft.ops.Dedup.lshBands(sigs, 16, 4)
    time("bands")(bands.count())
    time("full q22")(graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    // simhash multipass hotspot: candidate volume vs hamming cost
    val sim = graft.ops.Dedup.simhash(docs, "doc_id", "text").localCheckpoint(true)
    time("simhash sigs")(sim.count())
    val blocks = sim.select(col("id"), col("simhash"),
      explode(array((0 until 4).map(k => struct(lit(k).as("tbl"),
        substring(col("simhash"), k * 16 + 1, 16).as("blk"))): _*)).as("t"))
      .select(col("id"), col("simhash"), col("t.tbl").as("tbl"), col("t.blk").as("blk"))
      .localCheckpoint(true)
    val cand = blocks.as("a").join(blocks.as("b"),
      col("a.tbl") === col("b.tbl") && col("a.blk") === col("b.blk") &&
        col("a.id") < col("b.id"))
    time("block candidates")(cand.count())
    time("multipass full")(graft.ops.Dedup.simhashPairsMultiPass(sim).count())
    spark.stop()
  }
}
