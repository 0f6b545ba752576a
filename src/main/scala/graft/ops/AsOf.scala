package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the LATEST right row with
  * right.ts <= left.ts on the same key (time-series point-in-time
  * lookup). Spark has no native operator for this; the naive
  * formulation (theta-join on key + ts range, then per-left-row max) is
  * a range join that explodes quadratically in dense keys.
  *
  * This implementation is the union + ordered-window form: tag both
  * sides, union them (schemas aligned, no join at all), and carry the
  * last-seen right payload forward with `last(..., ignoreNulls)` over a
  * (key, ts, side) ordering. ONE shuffle on the key, state is a single
  * struct per row — the optimal distributed shape, identical on a
  * 1000-executor cluster.
  *
  * Ordering contract: right rows sort BEFORE left rows at equal ts
  * (side 0 < side 1), so the match is inclusive (right.ts == left.ts
  * matches), and ties among right rows at the same (key, ts) resolve to
  * the row LAST in `tieCol` ascending order — callers wanting
  * deterministic output should dedupe or pass a unique tieCol. */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPayloadCols: Seq[String], tieCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightPayloadCols.map(col): _*)
    val payloadType = org.apache.spark.sql.types.StructType(
      rightPayloadCols.map(c => right.schema(c)))
    val leftType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))

    val tieOrder: Column = tieCol.map(col).getOrElse(lit(0))
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__rv", lit(null).cast(payloadType))
      .select(col(key), col(ts).as("__ts"), col("__side"), col("__tie"),
        col("__rv"), struct(leftCols.map(col): _*).as("__lv"))
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__tie", tieOrder.cast("long"))
      .select(col(key), col(ts).as("__ts"), col("__side"), col("__tie"),
        payload.as("__rv"), lit(null).cast(leftType).as("__lv"))

    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("__match", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__lv.$c").as(c)) ++
        rightPayloadCols.map(c => col(s"__match.$c").as(c)): _*)
  }
}
