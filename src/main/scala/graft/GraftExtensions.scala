package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions wiring: exposes graft's native expressions to
  * SQL (`spark.sql("SELECT minhash_signature(...)")`) and to any session
  * configured with `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Only function registration is injected — the engine deliberately needs
  * no custom optimizer rules or planner strategies: every operator is
  * expressed through Catalyst-native plans (SURVEY.md §4), so pushdown,
  * pruning, join planning, and AQE all apply untouched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (name, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
          builder(args)
        }))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** (name, arity, builder) for each SQL-exposed native function. */
  val registrations: Seq[(String, Int, Seq[Expression] => Expression)] = Seq(
    ("minhash_signature", 2, args => MinHashSignature(args(0), intLit(args(1), "k"))),
    ("simhash64", 1, args => SimHash64(args(0))),
    ("srp_signature", 2, args => SrpSignature(args(0), intLit(args(1), "planes"))),
    ("cosine_similarity", 2, args => CosineSimilarity(args(0), args(1))),
    ("shingle_hashes", 2, args => ShingleHashes(args(0), intLit(args(1), "n"))),
    ("token_hashes", 1, args => TokenHashes(args(0))),
    ("bounded_levenshtein", 3, args =>
      BoundedLevenshtein(args(0), args(1), intLit(args(2), "k"))),
    ("deletion_hashes", 2, args => DeletionHashes(args(0), intLit(args(1), "k"))),
  )

  /** Register the same functions on an already-built session (tests,
    * notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    registrations.foreach { case (name, arity, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (args: Seq[Expression]) => {
          require(args.length == arity, s"$name expects $arity arguments, got ${args.length}")
          builder(args)
        })
    }
}
