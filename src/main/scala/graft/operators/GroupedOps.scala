package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Typed grouped-map operators (SURVEY.md §2.2k): the JVM-native analogue of
  * the reference-visible `GroupedData.applyInPandas` — an arbitrary
  * per-group function over grouped rows with a declared output schema.
  * Prefer expressions/windows when they can say it; this is the escape hatch
  * for genuinely imperative per-group logic. */
object GroupedOps {

  /** Applies `f` to each key group. One shuffle on `keyCols`; each group is
    * streamed to `f` as an iterator (never materialized on the driver).
    * At 100 TB the constraint is per-group size, exactly as with
    * applyInPandas — keep groups bounded or pre-aggregate. */
  def applyPerGroup(df: DataFrame, keyCols: Seq[String], outputSchema: StructType)(
      f: (Row, Iterator[Row]) => Iterator[Row]): DataFrame = {
    val keyEnc: Encoder[Row] = Encoders.row(StructType(keyCols.map(df.schema(_))))
    val outEnc: Encoder[Row] = Encoders.row(outputSchema)
    df.groupByKey { row =>
      Row.fromSeq(keyCols.map(c => row.getAs[Any](c)))
    }(keyEnc).flatMapGroups { (key: Row, rows: Iterator[Row]) => f(key, rows) }(outEnc)
      .toDF(outputSchema.fieldNames: _*)
  }
}

/** Skew mitigation for joins (SURVEY.md §2.3 scale rules). AQE's skew-join
  * splitting is the first line of defense; explicit salting is for the
  * pathological single-hot-key case where even a split partition overwhelms
  * one task's build side. */
object SkewJoin {

  /** Salted inner equi-join: the (possibly skewed) left side gets a uniform
    * salt in [0, saltFactor); the right side is replicated saltFactor times,
    * so each hot key fans out across saltFactor reducers instead of one.
    * Results are identical to a plain inner join on `keyCol`; only the
    * shuffle layout changes. Use when right is small enough to replicate. */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keyCol: String, saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor.toLong)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(keyCol, "__salt"), "inner").drop("__salt")
  }
}
