package graft.api

import graft.model.Canon._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S7 result sink: serialize canonical rows to the reference's wire JSON —
  * `{"timestamp": t, "tag": [{"n":"v"},...], "value": x}` with `tag`
  * omitted for untagged points (reference `src/shard.re:94-108`, field
  * order timestamp/tag/value).
  */
object Wire {

  /** One JSON string per datapoint, reference field order, tag omitted when
    * null (to_json drops null fields). The tag assoc list round-trips to
    * the array-of-single-key-objects form via a 2-level transform — no UDF.
    */
  def toJsonRows(df: DataFrame): DataFrame =
    df.select(to_json(struct(
      col(TS_US).as("timestamp"),
      transform(col(TAG), e => map(e.getField("name"), e.getField("value"))).as("tag"),
      col(VALUE).as("value"))).as("json"))

  /** The reference's aggregate output shape: `{"<agg>": v}` single object
    * (empty DataFrame in → empty result, the `{}` analog).
    */
  def aggToJson(agg: DataFrame): DataFrame =
    agg.select(to_json(struct(agg.columns.map(col): _*)).as("json"))
}
