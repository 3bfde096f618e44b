package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift reconciliation: union batches whose schemas diverged —
  * columns added or dropped between extracts, numeric types widened by
  * an upstream system. The reference app re-uploads full extracts per
  * session (rajatparida125/etl-tool-rep main.py:245-255) and pandas
  * `concat` silently aligns by name, filling NaN; this is that
  * semantic made explicit, typed, and total: missing columns back-fill
  * NULL, conflicting types resolve by deterministic widening, anything
  * irreconcilable fails loud instead of corrupting.
  *
  * Widening lattice (promotion only — never lossy narrowing):
  * byte < short < int < long < decimal < double; any numeric ∨ string
  * → string (the CSV-reload reality); date < timestamp; identical
  * types pass through. Struct/array/map conflicts are rejected — a
  * nested drift needs an explicit migration, not a silent cast.
  *
  * Plan cost: pure projection per batch (casts + NULL literals), one
  * union — no shuffle, no data rewrite beyond the scan itself.
  */
object SchemaDrift {

  private val numericRank: Map[DataType, Int] = Map(
    ByteType -> 0, ShortType -> 1, IntegerType -> 2, LongType -> 3,
    FloatType -> 5, DoubleType -> 6)

  /** Least upper bound of two types under the widening lattice;
    * None when irreconcilable. */
  def widen(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case (x, y) if x == y => Some(x)
    // String absorption FIRST: with these below the decimal cases,
    // widen(string, decimal) would ping-pong between the two
    // flip-argument cases — (x, y: DecimalType) flips to (decimal,
    // string), (x, StringType) flips straight back — and recurse
    // forever (found by the lattice property battery).
    case (StringType, y) if numericRank.contains(y) || y.isInstanceOf[DecimalType] ||
      y == DateType || y == TimestampType || y == BooleanType => Some(StringType)
    case (x, StringType) => widen(StringType, x)
    case (x: DecimalType, y: DecimalType) =>
      // enough integral digits and scale for both — or NOTHING. Capping
      // precision at 38 while keeping the wider scale (e.g.
      // decimal(38,0) ∨ decimal(10,10) → decimal(38,10)) would produce
      // a type that cannot hold all values of one input; the later cast
      // silently NULLs them (non-ANSI), violating the never-lossy
      // contract. No exact LUB exists past 38 combined digits, so this
      // is drift that needs an explicit migration: fail loud via None.
      val scale = math.max(x.scale, y.scale)
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      if (intDigits + scale > DecimalType.MAX_PRECISION) None
      else Some(DecimalType(intDigits + scale, scale))
    case (x: DecimalType, y) if numericRank.contains(y) =>
      if (numericRank(y) <= 3) widen(x, DecimalType(20, 0)) // any integral fits (20,0)
      else Some(DoubleType) // float/double: decimal can't hold all doubles
    case (x, y: DecimalType) => widen(y, x)
    case (x, y) if numericRank.contains(x) && numericRank.contains(y) =>
      Some(if (numericRank(x) >= numericRank(y)) x else y)
    case (DateType, TimestampType) | (TimestampType, DateType) => Some(TimestampType)
    case _ => None
  }

  /** Union `batches` under drift: output columns are the UNION of all
    * batch columns in first-appearance order, each at the widened type;
    * batches missing a column carry typed NULLs. */
  def reconcileUnion(batches: Seq[DataFrame]): DataFrame = {
    require(batches.nonEmpty, "reconcileUnion needs at least one batch")
    val ordered = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
    batches.foreach(_.schema.fields.foreach { f =>
      ordered.get(f.name) match {
        case None => ordered(f.name) = f.dataType
        case Some(t) =>
          val w = widen(t, f.dataType).getOrElse(throw new IllegalArgumentException(
            s"column '${f.name}': cannot reconcile ${t.simpleString} with " +
              s"${f.dataType.simpleString} — nested or non-widenable drift needs " +
              "an explicit migration"))
          ordered(f.name) = w
      }
    })
    val target = ordered.toSeq
    batches.map { df =>
      val have = df.columns.toSet
      df.select(target.map { case (n, t) =>
        (if (have(n)) col(n).cast(t) else lit(null).cast(t)).as(n)
      }: _*)
    }.reduce(_ unionByName _)
  }
}
