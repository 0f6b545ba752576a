package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join — an operator Spark's planner has no native
  * strategy for: `l.key = r.key AND r.start <= l.ts < r.end` plans as
  * a hash join on `key` with the range as a post-filter, which
  * co-locates EVERY row of a key on one task. At web scale one hot key
  * (a bot user, a default tenant) concentrates millions of rows; the
  * range predicate does nothing to split them.
  *
  * The scale shape used here is the standard grid-cell (a.k.a.
  * bucketed-overlap) decomposition: quantize time into fixed-width
  * cells, explode each interval to the cells it covers, tag each point
  * with its single cell, and equi-join on (key, cell). The join key
  * gains a time dimension, so a hot key's rows spread across its time
  * range instead of one reducer; candidate volume stays linear as long
  * as `cellWidthMicros` is chosen near the typical interval length
  * (cells per interval = len/width + 1; a point matches exactly one
  * cell, so no post-join dedup is needed). The exact containment
  * predicate is re-checked after the equi-join, so the result is
  * EXACTLY the theta-join semantics at any cell width.
  */
object RangeJoin {

  /** Cell index of an epoch-micros column: exact integer floor-div.
    * (`floor(m / w)` in doubles can land on the wrong side of a cell
    * boundary once values stop being exactly representable; subtracting
    * the remainder first makes the quotient an exact multiple, whose
    * double division is exact.) */
  private def cellOfMicros(m: Column, w: Long): Column =
    ((m - pmod(m, lit(w))) / lit(w)).cast("long")

  /** Point-in-interval join: rows of `left` whose timestamp `tsCol`
    * falls inside a `right` row's half-open [startCol, endCol)
    * interval, equi-matched on `keyCols`. Returns left columns joined
    * with right's non-key columns; intervals with `end <= start` match
    * nothing. Columns other than the keys must not collide between the
    * two sides (rename before calling).
    *
    * One shuffle per side, keyed by (keys..., cell) — never by the bare
    * key — plus the map-only interval explode. */
  def pointInInterval(left0: DataFrame, right0: DataFrame,
      keyCols: Seq[String], tsCol: String,
      startCol: String, endCol: String,
      cellWidthMicros: Long): DataFrame = {
    require(cellWidthMicros > 0, "cellWidthMicros must be positive")
    val left = Par.ensure(left0)
    val right = Par.ensure(right0)
    val sM = unix_micros(col(startCol))
    // end is exclusive: the last covered micro is end - 1
    val eM = unix_micros(col(endCol)) - lit(1L)
    val rightCells = right
      .filter(unix_micros(col(endCol)) > unix_micros(col(startCol)))
      .withColumn("__cell", explode(sequence(
        cellOfMicros(sM, cellWidthMicros), cellOfMicros(eM, cellWidthMicros))))
    val leftCell = left.withColumn("__cell",
      cellOfMicros(unix_micros(col(tsCol)), cellWidthMicros))
    leftCell
      .join(rightCells, keyCols :+ "__cell")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__cell")
  }
}
