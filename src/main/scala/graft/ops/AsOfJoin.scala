package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of joins: for each left row, attach values from the single right
  * row nearest in time within the same key group — backward (greatest
  * right.ts <= left.ts; point-in-time lookup, DuckDB/kdb ASOF JOIN
  * semantics including ts-equality matches) or forward (smallest
  * right.ts >= left.ts; next-event attribution).
  *
  * Spark has no as-of operator; the naive encodings are a range cross
  * join (quadratic blowup) or a per-left-row subquery (driver loop). The
  * scalable shape used here is union + window:
  *
  *   1. tag rows by side, union on a common schema;
  *   2. one shuffle+sort per key group ordered by (ts, side, tiebreak) —
  *      right rows sort on the qualifying side of left rows at equal ts
  *      so the inclusive match holds in either direction;
  *   3. ALL picked right values travel in ONE struct column;
  *      last(struct, ignoreNulls) over unbounded-preceding (backward) or
  *      first(struct, ignoreNulls) over unbounded-following (forward)
  *      carries the matched right ROW as a unit — a single struct (never
  *      its fields independently), so every attached value comes from
  *      the same matched right row even when some of its fields are
  *      NULL;
  *   4. keep only left rows, expand the struct.
  *
  * Cost at any scale: exactly one hash shuffle of |L|+|R| rows and one
  * sort — the same price as a sort-merge join, with no pair explosion.
  * Rows with no match keep null picked columns (left-join semantics).
  */
object AsOfJoin {

  /** Most recent right row at-or-before each left row's ts.
    *
    * @param keys    equality keys (both sides)
    * @param tsCol   ordering column name (both sides; any orderable type)
    * @param pick    right-side columns to attach, renamed `<name><suffix>`
    * @param tiebreakCol optional right-side column ordering ties among
    *                equal (key, ts) right rows — the max wins; pass a
    *                unique id for full determinism
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      pick: Seq[String], suffix: String = "_asof",
      tiebreakCol: Option[String] = None): DataFrame =
    asof(left, right, keys, tsCol, pick, suffix, tiebreakCol, forwardDir = false)

  /** Earliest right row at-or-after each left row's ts. Ties among equal
    * (key, ts) right rows resolve to the MIN tiebreak (the first row in
    * scan order of the tiebreak column). */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      pick: Seq[String], suffix: String = "_asof",
      tiebreakCol: Option[String] = None): DataFrame =
    asof(left, right, keys, tsCol, pick, suffix, tiebreakCol, forwardDir = true)

  /** Nearest right row in EITHER direction: for each left row, the
    * right row minimizing |left.ts − right.ts| within the key group —
    * sensor alignment / closest-fix enrichment, where at-or-before is
    * the wrong bias. Composes the backward and forward passes (each
    * one union+window shuffle, so still no pair explosion) and picks
    * the closer side per row; EQUAL distances prefer the at-or-before
    * match, and rows with only one side matched take it. `tsCol` must
    * be numeric (epoch seconds/micros): distances subtract. */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      pick: Seq[String], suffix: String = "_asof",
      tiebreakCol: Option[String] = None): DataFrame = {
    val pickAll = pick.distinct
    val withTs = (pickAll :+ tsCol).distinct
    val b = backward(left, right, keys, tsCol, withTs, "_bk__", tiebreakCol)
    val bf = forward(b, right, keys, tsCol, withTs, "_fw__", tiebreakCol)
    val ts = col(tsCol)
    val bts = col(tsCol + "_bk__")
    val fts = col(tsCol + "_fw__")
    val useB = fts.isNull || (bts.isNotNull && (ts - bts) <= (fts - ts))
    val out = pickAll.map(p =>
      when(useB, col(p + "_bk__")).otherwise(col(p + "_fw__")).as(p + suffix))
    bf.select(
      bf.columns.filterNot(_.endsWith("__")).map(col).toSeq ++ out: _*)
  }

  private def asof(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      pick: Seq[String], suffix: String, tiebreakCol: Option[String],
      forwardDir: Boolean): DataFrame = {
    require(pick.nonEmpty, "pick at least one right-side column")
    val leftCarry = left.columns.toSeq.diff(keys :+ tsCol)
    val pickedOut = pick.map(p => p + suffix)
    val tb = "__graft_tb"
    val pk = "__graft_pick"
    val rightSchema = right.schema
    val leftSchema = left.schema
    // one struct holds every picked value: a right row contributes a
    // NON-null struct even when individual fields are null, so
    // first/last(ignoreNulls) can never mix fields from different rows
    val pickType = org.apache.spark.sql.types.StructType(
      pick.map(p => org.apache.spark.sql.types.StructField(p, rightSchema(p).dataType)))
    val tbType = tiebreakCol.map(rightSchema(_).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType)

    // side codes: the right side must sort toward the left row it can
    // match — BEFORE left rows at equal ts for backward ("<="), AFTER
    // for forward (">=")
    val (leftSrc, rightSrc) = if (forwardDir) (0, 1) else (1, 0)
    val unionCols = keys ++ Seq(tsCol, "__graft_src", tb, pk) ++ leftCarry
    val fromLeft = left.select(
      (keys ++ Seq(tsCol)).map(col) ++
        Seq(lit(leftSrc).as("__graft_src"),
          lit(null).cast(tbType).as(tb),
          lit(null).cast(pickType).as(pk)) ++
        leftCarry.map(col): _*)
    val fromRight = right.select(
      (keys ++ Seq(tsCol)).map(col) ++
        Seq(lit(rightSrc).as("__graft_src"),
          tiebreakCol.map(col(_).cast(tbType)).getOrElse(lit(null).cast(tbType)).as(tb),
          struct(pick.map(p => col(p).as(p)): _*).as(pk)) ++
        leftCarry.map(c => lit(null).cast(leftSchema(c).dataType).as(c)): _*)

    val ordered = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__graft_src").asc, col(tb).asc_nulls_first)
    val w =
      if (forwardDir) ordered.rowsBetween(0, Window.unboundedFollowing)
      else ordered.rowsBetween(Window.unboundedPreceding, 0)
    val carry =
      if (forwardDir) first(col(pk), ignoreNulls = true)
      else last(col(pk), ignoreNulls = true)
    val carried = fromLeft.select(unionCols.map(col): _*)
      .unionByName(fromRight.select(unionCols.map(col): _*))
      .select(
        (keys ++ Seq(tsCol, "__graft_src")).map(col) ++ leftCarry.map(col) :+
          carry.over(w).as(pk): _*)
    carried
      .filter(col("__graft_src") === leftSrc)
      .select(
        (keys ++ Seq(tsCol)).map(col) ++ leftCarry.map(col) ++
          pick.zip(pickedOut).map { case (p, o) => col(pk).getField(p).as(o) }: _*)
  }
}
