package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Checks
import graft.sources.Tables

/** Throwaway r18 instrumentation. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val li = Tables.load(spark, sfDir, "lineitem")
    println(s"[scratch] lineitem scan partitions = ${li.rdd.getNumPartitions}")
    (0 until 3).foreach { round =>
      println(s"[scratch] === round $round")
      time("suggest as-is")(noop(Checks.suggest(li)))
      time("suggest repart32")(noop(Checks.suggest(li.repartition(32))))
      // psi: current shape vs fused-count shape
      val shifted = li.select((col("l_extendedprice") * lit(1.3)).as("l_extendedprice"))
      time("driftPsi as-is")(noop(Checks.driftPsi(li, shifted, "l_extendedprice", 10)))
    }
    spark.stop()
  }
}
