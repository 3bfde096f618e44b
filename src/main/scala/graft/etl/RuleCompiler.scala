package graft.etl

import scala.collection.mutable
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Result of compiling + applying a rule pipeline: the output DataFrame
  * (only rule-produced columns, reference main.py:135-138) plus
  * diagnostics for rules that were skipped (reference main.py:152-157,
  * 173-174 report-and-continue semantics). */
final case class PipelineResult(output: DataFrame, errors: Seq[RuleError])

/** Compiles an ordered rule list into ONE Catalyst plan.
  *
  * Where the reference executes eagerly — one full-table pandas pass per
  * rule (main.py:140-174) — this engine compiles the whole list into a
  * single `select` over the main table, preceded by one broadcast left
  * join per Lookup rule. Catalyst then fuses projections, prunes unused
  * source columns down to the parquet scan, and keeps the entire pipeline
  * shuffle-free: Direct Map / Conditional are narrow, and Lookup joins
  * broadcast dimension-sized mappings (main.py:278-308 loads mappings from
  * small side files), so no stage boundary is ever introduced. At cluster
  * scale a pipeline over N rules is one pass over the data regardless of N.
  */
object RuleCompiler {

  private final val LookupColPrefix = "__graft_lk_"
  private final val OrdCol = "__graft_ord"
  private final val KeyCol = "__graft_key"

  /** Compile and apply `rules` to `main`, resolving Lookup rules against
    * `mappings`. Failed rules are reported and skipped; the rest run.
    *
    * @param pandasNanCoercion exact-parity mode for the reference's
    *   `.astype(str)` lookup coercion (main.py:168-169): pandas renders a
    *   float NaN as the literal string "nan", so a NULL probe value can
    *   genuinely match a mapping key whose stringified form is "nan".
    *   Spark's `cast(null as string)` stays null (no match). Off by
    *   default — the Spark-natural semantics is almost always what users
    *   want; switch on only when byte-for-byte reference parity matters.
    * @param broadcastLookups hint every mapping for broadcast (default).
    *   Correct for the reference's contract — mappings are interactive
    *   side-file uploads, dimension-sized by construction. Pass false
    *   when a mapping table SCALES with the data (the forced hint would
    *   OOM executors at 100×); the join strategy is then left to
    *   Catalyst statistics + AQE, which still broadcasts anything that
    *   measures small at runtime.
    */
  def run(main: DataFrame, rules: Seq[Rule], mappings: Map[String, DataFrame],
      pandasNanCoercion: Boolean = false,
      broadcastLookups: Boolean = true): PipelineResult = {
    val errors = mutable.ArrayBuffer.empty[RuleError]
    // Output column order follows first occurrence of each name; a later
    // rule with the same name overwrites the value but keeps the original
    // position (pandas column-assignment semantics, main.py:146).
    val outCols = mutable.LinkedHashMap.empty[String, Column]
    var df = main
    var lookupIdx = 0

    rules.foreach { rule =>
      compileOne(rule, df, mappings, lookupIdx, pandasNanCoercion, broadcastLookups) match {
        case Left(err) => errors += err
        case Right((joined, column, usedLookup)) =>
          // Validate resolution eagerly (no job runs): unknown columns fail
          // here, matching the reference's per-rule error isolation.
          Try(joined.select(column)) match {
            case Success(_) =>
              df = joined
              if (usedLookup) lookupIdx += 1
              outCols(rule.name) = column.alias(rule.name)
            case Failure(e) => errors += RuleError(rule, e.getMessage)
          }
      }
    }

    val output =
      if (outCols.isEmpty) df.select() // zero-column frame, matches empty out_df
      else df.select(outCols.values.toSeq: _*)
    PipelineResult(output, errors.toSeq)
  }

  /** Compile one rule. Returns the (possibly join-augmented) frame, the
    * output Column, and whether a lookup join was consumed. */
  private def compileOne(rule: Rule, df: DataFrame, mappings: Map[String, DataFrame],
      lookupIdx: Int, pandasNanCoercion: Boolean,
      broadcastLookups: Boolean = true): Either[RuleError, (DataFrame, Column, Boolean)] = rule match {

    case DirectMap(_, source) =>
      if (!df.columns.contains(source))
        Left(RuleError(rule, s"source column '$source' not found"))
      else Right((df, col(quote(source)), false))

    case Conditional(_, expression, thenV, elseV) =>
      CondExpr.translate(expression, df.schema) match {
        case Left(msg) => Left(RuleError(rule, s"Logic Error: $msg"))
        // Output is always string-typed: then/else come from text inputs
        // (main.py:388-389). Null predicate (e.g. null > 500) falls through
        // to otherwise, matching pandas NaN-comparison-is-False.
        case Right(cond) => Right((df, when(cond, lit(thenV)).otherwise(lit(elseV)), false))
      }

    case Lookup(_, mapName, inCol, keyCol, valCol) =>
      mappings.get(mapName) match {
        case None => Left(RuleError(rule, s"Mapping table '$mapName' not found."))
        case Some(mapping) =>
          if (!df.columns.contains(inCol))
            Left(RuleError(rule, s"match column '$inCol' not found"))
          else if (!mapping.columns.contains(keyCol))
            Left(RuleError(rule, s"key column '$keyCol' not found in '$mapName'"))
          else if (!mapping.columns.contains(valCol))
            Left(RuleError(rule, s"value column '$valCol' not found in '$mapName'"))
          else {
            val valOut = s"$LookupColPrefix$lookupIdx"
            val keyOut = s"$KeyCol$lookupIdx"
            // Last-occurrence-wins duplicate-key handling, as in the
            // reference's dict(zip(keys, vals)) build (main.py:168):
            // order rows by file position (monotonically_increasing_id is
            // monotone within and across input splits in read order) and
            // keep the value of the max position per stringified key.
            // CONTRACT: "last occurrence" is well-defined only when the
            // mapping is a fresh source scan (the reference's only input
            // shape — an uploaded file). A mapping that already went
            // through a shuffle/join/repartition has no stable row order
            // in ANY engine; pass such tables through a deduplicating
            // aggregation with an explicit ordering column first.
            def strKey(c: Column): Column =
              if (pandasNanCoercion) coalesce(c.cast("string"), lit("nan"))
              else c.cast("string")
            val prepared = mapping
              .withColumn(OrdCol, monotonically_increasing_id())
              .groupBy(strKey(col(quote(keyCol))).as(keyOut))
              .agg(max_by(col(quote(valCol)), col(OrdCol)).as(valOut))
            // Broadcast hash join: mappings are dimension-sized by
            // construction, so the probe stays narrow (no shuffle of the
            // fact table) — the distributed analogue of the reference's
            // O(1) dict probe per row (main.py:169).
            val joined = df.join(
              if (broadcastLookups) broadcast(prepared) else prepared,
              strKey(df.col(quote(inCol))) === prepared.col(keyOut),
              "left")
              .drop(keyOut)
            Right((joined, col(valOut), true))
          }
      }
  }

  private def quote(name: String): String =
    if (name.forall(ch => ch.isLetterOrDigit || ch == '_')) name
    else "`" + name.replace("`", "``") + "`"
}
