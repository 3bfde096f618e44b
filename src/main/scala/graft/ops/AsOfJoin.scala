package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach values from the right
  * row with the greatest right.ts <= left.ts in the same key group
  * (time-series point-in-time lookup; DuckDB/kdb ASOF JOIN semantics,
  * including ts-equality matches).
  *
  * Spark has no as-of operator; the naive encodings are a range cross
  * join (quadratic blowup) or a per-left-row subquery (driver loop). The
  * scalable shape used here is union + window:
  *
  *   1. tag left rows src=1, right rows src=0, union on a common schema;
  *   2. one shuffle+sort per key group ordered by (ts, src, tiebreak) —
  *      right rows sort before left rows at equal ts so "<=" holds;
  *   3. ALL picked right values travel in ONE struct column;
  *      last(struct, ignoreNulls) over rows-unbounded-preceding carries
  *      the most recent right ROW forward — a single struct (never its
  *      fields independently), so every attached value comes from the
  *      same matched right row even when some of its fields are NULL;
  *   4. keep only left rows, expand the struct.
  *
  * Cost at any scale: exactly one hash shuffle of |L|+|R| rows and one
  * sort — the same price as a sort-merge join, with no pair explosion.
  * Rows with no prior right match keep null picked columns (left-join
  * semantics).
  */
object AsOfJoin {

  /** @param keys    equality keys (both sides)
    * @param tsCol   ordering column name (both sides; any orderable type)
    * @param pick    right-side columns to attach, renamed `<name><suffix>`
    * @param tiebreakCol optional right-side column ordering ties among
    *                equal (key, ts) right rows — the max wins; pass a
    *                unique id for full determinism
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      pick: Seq[String], suffix: String = "_asof",
      tiebreakCol: Option[String] = None): DataFrame = {
    require(pick.nonEmpty, "pick at least one right-side column")
    val leftCarry = left.columns.toSeq.diff(keys :+ tsCol)
    val pickedOut = pick.map(p => p + suffix)
    val tb = "__graft_tb"
    val pk = "__graft_pick"
    val rightSchema = right.schema
    val leftSchema = left.schema
    // one struct holds every picked value: a right row contributes a
    // NON-null struct even when individual fields are null, so
    // last(ignoreNulls) can never mix fields from different right rows
    val pickType = org.apache.spark.sql.types.StructType(
      pick.map(p => org.apache.spark.sql.types.StructField(p, rightSchema(p).dataType)))

    val unionCols = keys ++ Seq(tsCol, "__graft_src", tb, pk) ++ leftCarry
    val fromLeft = left.select(
      (keys ++ Seq(tsCol)).map(col) ++
        Seq(lit(1).as("__graft_src"),
          lit(null).cast(tiebreakCol.map(rightSchema(_).dataType).getOrElse(
            org.apache.spark.sql.types.LongType)).as(tb),
          lit(null).cast(pickType).as(pk)) ++
        leftCarry.map(col): _*)
    val fromRight = right.select(
      (keys ++ Seq(tsCol)).map(col) ++
        Seq(lit(0).as("__graft_src"),
          tiebreakCol.map(col(_).cast(tiebreakCol.map(rightSchema(_).dataType).get))
            .getOrElse(lit(null).cast(org.apache.spark.sql.types.LongType)).as(tb),
          struct(pick.map(p => col(p).as(p)): _*).as(pk)) ++
        leftCarry.map(c => lit(null).cast(leftSchema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__graft_src").asc, col(tb).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = fromLeft.select(unionCols.map(col): _*)
      .unionByName(fromRight.select(unionCols.map(col): _*))
      .select(
        (keys ++ Seq(tsCol, "__graft_src")).map(col) ++ leftCarry.map(col) :+
          last(col(pk), ignoreNulls = true).over(w).as(pk): _*)
    carried
      .filter(col("__graft_src") === 1)
      .select(
        (keys ++ Seq(tsCol)).map(col) ++ leftCarry.map(col) ++
          pick.zip(pickedOut).map { case (p, o) => col(pk).getField(p).as(o) }: _*)
  }
}
