import org.apache.spark.sql.DataFrame

/** Implicit bridges — the Scala analogue of the reference's
  * `isinstance(mf, DataFrame)` compatibility trick (reference:
  * metaframe/metaframe.py:27, 62; SURVEY.md §1.4/§7.1): a `MetaFrame` can be
  * used anywhere a `DataFrame` is expected, and any `DataFrame` can be lifted
  * into the metadata layer with `.meta` / `.meta(...)`. */
package object graft {
  implicit def metaFrameToDataFrame(mf: MetaFrame): DataFrame = mf.df

  implicit final class RichDataFrame(private val df: DataFrame) extends AnyVal {
    def meta: MetaFrame = MetaFrame(df)
    def meta(metadata: Map[String, Any]): MetaFrame = MetaFrame(df, metadata)
  }
}
