package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Udafs
import graft.operators.{GroupedOps, SkewJoin}

/** Tests for the typed grouped-map escape hatch, the Aggregator UDAF, and
  * salted skew joins. */
class GroupedOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSparkSession.spark

  test("applyPerGroup: imperative per-group top-2 matches window top-2") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 4L, 5.0), ("b", 5L, 15.0)
    ).toDF("k", "id", "v")
    val out = GroupedOps.applyPerGroup(df, Seq("k"),
      StructType(Seq(StructField("k", StringType), StructField("id", LongType), StructField("v", DoubleType)))) {
      (key, rows) =>
        rows.toSeq.sortBy(-_.getAs[Double]("v")).take(2)
          .map(r => Row(key.getString(0), r.getAs[Long]("id"), r.getAs[Double]("v"))).iterator
    }
    val got = out.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 2L), ("a", 3L), ("b", 5L), ("b", 4L)))
  }

  test("WeightedMean aggregator matches the SQL sum(v*w)/sum(w)") {
    import spark.implicits._
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 2.0)).toDF("k", "v", "w")
    val got = df.groupBy("k").agg(Udafs.weightedMean(col("v"), col("w")).as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got("a") - 17.5) < 1e-12)
    assert(math.abs(got("b") - 5.0) < 1e-12)
  }

  test("saltedInnerJoin returns exactly the plain join's rows") {
    import spark.implicits._
    // skewed left: one hot key
    val left = ((1 to 500).map(i => ("hot", i.toLong)) ++ Seq(("cold", 0L))).toDF("k", "lv")
    val right = Seq(("hot", "H"), ("cold", "C"), ("absent", "X")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"), "inner")
    val salted = SkewJoin.saltedInnerJoin(left, right, "k", saltFactor = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }
}
