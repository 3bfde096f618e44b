package graft.etl

import scala.util.Random

/** Deterministic differential-fuzz generator for the CondExpr grammar.
  *
  * Each case is one random well-formed boolean expression rendered TWICE
  * from the same AST: once in the reference's pandas-eval grammar (fed to
  * `CondExpr.translate`, reference main.py:354-389) and once as DuckDB SQL
  * with IDENTICAL semantics — including the translator's documented
  * Python-isms: `~` of a null comparison is True (`NOT COALESCE(x,
  * FALSE)`), cross-type `==`/`!=` folds to constant FALSE/TRUE, bools act
  * as 0/1 against numbers, `+` concatenates strings. The driver evaluates
  * both sides over the same parquet rows and hash-compares per-expression
  * aggregates, closing the grammar's parity with an engine-independent
  * oracle instead of hand-picked cases.
  *
  * Cross-engine landmines designed out (each would be a false-positive
  * divergence, not a translator bug):
  *  - double literals render as `CAST(x AS DOUBLE)` in SQL — a bare
  *    `0.1` is DECIMAL in DuckDB and its exact arithmetic diverges from
  *    Spark's binary doubles;
  *  - the same parenthesized tree is emitted on both sides, so IEEE
  *    evaluation order is identical;
  *  - integer `*` chains are magnitude-bounded (a long overflow throws
  *    in BOTH engines under ANSI — the generator morphs an overflowable
  *    `*` into `+`);
  *  - `/` divisors are non-zero literals (both engines float-divide
  *    integers, but 0 would raise vs produce inf depending on type).
  *
  * Determinism: java.util.Random's LCG is part of the JVM spec, so a
  * fixed seed reproduces the identical battery on every run and machine —
  * `queries` and `oracleSql` call this independently and must agree.
  *
  * The generated expressions assume the fuzz base schema:
  *   k BIGINT, price DOUBLE, status VARCHAR, prio VARCHAR,
  *   nk BIGINT NULL, ns VARCHAR NULL, b BOOLEAN, d TIMESTAMP.
  */
object FuzzCondExpr {

  final case class FuzzCase(id: String, expr: String, duck: String)

  /** Rendered boolean node. */
  private final case class B(expr: String, duck: String)

  /** Rendered operand: both renderings, category, and (for integral
    * operands) a magnitude bound used to keep long arithmetic wrap-free.
    * `intBound = None` marks a double-typed operand (cannot overflow —
    * goes to ±inf identically in both engines). */
  private final case class O(expr: String, duck: String, intBound: Option[Double])

  private val cmpOps = Vector("==", "!=", ">", "<", ">=", "<=")
  private def duckCmp(op: String): String = op match {
    case "==" => "="
    case "!=" => "<>"
    case o => o
  }

  // values present in the fixture plus misses; ASCII only, so Spark's
  // UTF8 binary ordering and DuckDB's default binary collation agree
  private val strPool = Vector(
    "F", "O", "P", "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW", "zz", "")

  /** The full battery: n cases, fully determined by (n, seed). */
  def cases(n: Int, seed: Long): IndexedSeq[FuzzCase] = {
    val rnd = new Random(seed)
    (1 to n).map { i =>
      val b = genBool(rnd, depth = 3)
      FuzzCase(f"e$i%04d", b.expr, b.duck)
    }
  }

  private def genBool(rnd: Random, depth: Int): B = {
    val roll = if (depth <= 0) 0 else rnd.nextInt(10)
    roll match {
      case r if r < 4 => genCmp(rnd)
      case r if r < 6 =>
        val l = genBool(rnd, depth - 1); val rr = genBool(rnd, depth - 1)
        B(s"(${l.expr} & ${rr.expr})", s"(${l.duck} AND ${rr.duck})")
      case r if r < 8 =>
        val l = genBool(rnd, depth - 1); val rr = genBool(rnd, depth - 1)
        B(s"(${l.expr} | ${rr.expr})", s"(${l.duck} OR ${rr.duck})")
      case _ =>
        // pandas ~mask of a NaN-compare is True; the translator coalesces
        val x = genBool(rnd, depth - 1)
        B(s"(~${x.expr})", s"(NOT COALESCE(${x.duck}, FALSE))")
    }
  }

  private def genCmp(rnd: Random): B = rnd.nextInt(20) match {
    case r if r < 9 => // numeric comparison (arithmetic on both sides)
      val l = genNum(rnd, 2); val r2 = genNum(rnd, 2); val op = cmpOps(rnd.nextInt(6))
      B(s"(${l.expr} $op ${r2.expr})", s"(${l.duck} ${duckCmp(op)} ${r2.duck})")
    case r if r < 13 => // string comparison (incl. concat operands)
      val l = genStr(rnd, 1); val r2 = genStr(rnd, 1); val op = cmpOps(rnd.nextInt(6))
      B(s"(${l.expr} $op ${r2.expr})", s"(${l.duck} ${duckCmp(op)} ${r2.duck})")
    case r if r < 15 => // bool vs bool: Python allows ==/!= naturally
      val op = if (rnd.nextBoolean()) "==" else "!="
      val lit = if (rnd.nextBoolean()) "True" else "False"
      val dl = lit.toUpperCase
      if (rnd.nextBoolean()) B(s"(`b` $op $lit)", s"(b ${duckCmp(op)} $dl)")
      else B(s"($lit $op `b`)", s"($dl ${duckCmp(op)} b)")
    case r if r < 17 => // bool vs number: Python treats bool as 0/1
      val op = cmpOps(rnd.nextInt(6))
      val nl = numLit(rnd)
      B(s"(`b` $op ${nl.expr})", s"(CAST(b AS INT) ${duckCmp(op)} ${nl.duck})")
    case r if r < 19 => // timestamp vs date-string (pandas parses the string)
      val op = cmpOps(rnd.nextInt(6))
      val ds = dateLit(rnd)
      if (rnd.nextBoolean())
        B(s"(`d` $op '$ds')", s"(d ${duckCmp(op)} CAST('$ds' AS TIMESTAMP))")
      else
        B(s"('$ds' $op `d`)", s"(CAST('$ds' AS TIMESTAMP) ${duckCmp(op)} d)")
    case _ => // cross-type ==/!= folds to elementwise False/True
      val op = if (rnd.nextBoolean()) "==" else "!="
      val sOp = genStr(rnd, 0); val nOp = genNum(rnd, 0)
      val (l, r2) = if (rnd.nextBoolean()) (sOp.expr, nOp.expr) else (nOp.expr, sOp.expr)
      B(s"($l $op $r2)", if (op == "==") "FALSE" else "TRUE")
  }

  // --- numeric operands ----------------------------------------------------

  /** Long-typed leaves stay under this magnitude; a `*` whose integral
    * product bound exceeds MaxIntProduct is morphed into `+`. Bound covers
    * o_orderkey up to 1e7 rows (sf >= 1 fixtures). */
  private val MaxKey = 1.0e7
  private val MaxIntProduct = 1.0e15

  private def genNum(rnd: Random, depth: Int): O = {
    if (depth <= 0 || rnd.nextInt(10) < 5) numLeaf(rnd)
    else {
      val op0 = "+-*/".charAt(rnd.nextInt(4)).toString
      val l = genNum(rnd, depth - 1)
      val r = if (op0 == "/") nonZeroLit(rnd) else genNum(rnd, depth - 1)
      val op = (l.intBound, r.intBound) match {
        case (Some(lb), Some(rb)) if op0 == "*" && lb * rb > MaxIntProduct => "+"
        case _ => op0
      }
      val bound = (l.intBound, r.intBound) match {
        case _ if op == "/" => None // both engines float-divide integers
        case (Some(lb), Some(rb)) => Some(if (op == "*") lb * rb else lb + rb)
        case _ => None
      }
      O(s"(${l.expr} $op ${r.expr})", s"(${l.duck} $op ${r.duck})", bound)
    }
  }

  private def numLeaf(rnd: Random): O = rnd.nextInt(10) match {
    case r if r < 3 => O("`k`", "k", Some(MaxKey))
    case r if r < 6 => O("`price`", "price", None)
    case 6 => O("`nk`", "nk", Some(7.0))
    case r if r < 9 =>
      val v = rnd.nextInt(1999) - 999 // small: safe inside * chains
      O(v.toString, v.toString, Some(999.0))
    case _ => dblLit(rnd)
  }

  /** Comparison-side literal: wider range for realistic selectivity. */
  private def numLit(rnd: Random): O =
    if (rnd.nextBoolean()) {
      val v = rnd.nextInt(600001) - 1000
      O(v.toString, v.toString, Some(600000.0))
    } else dblLit(rnd)

  private def dblLit(rnd: Random): O = {
    val v = rnd.nextInt(60000001) / 100.0
    val plain = java.math.BigDecimal.valueOf(v).toPlainString
    val rendered = if (plain.contains('.')) plain else plain + ".0"
    O(rendered, s"CAST($rendered AS DOUBLE)", None)
  }

  private def nonZeroLit(rnd: Random): O =
    if (rnd.nextBoolean()) {
      val v = 1 + rnd.nextInt(999)
      O(v.toString, v.toString, Some(999.0))
    } else {
      val v = (50 + rnd.nextInt(99900)) / 100.0 // [0.5, 999.5]
      val plain = java.math.BigDecimal.valueOf(v).toPlainString
      val rendered = if (plain.contains('.')) plain else plain + ".0"
      O(rendered, s"CAST($rendered AS DOUBLE)", None)
    }

  // --- string operands -----------------------------------------------------

  private def genStr(rnd: Random, depth: Int): O = {
    val roll = rnd.nextInt(10)
    if (roll >= 9 && depth > 0) {
      val l = genStr(rnd, depth - 1); val r = genStr(rnd, depth - 1)
      O(s"(${l.expr} + ${r.expr})", s"(${l.duck} || ${r.duck})", None)
    } else roll match {
      case r if r < 3 => O("`status`", "status", None)
      case 3 | 4 => O("`prio`", "prio", None)
      case 5 => O("`ns`", "ns", None)
      case _ =>
        val v = strPool(rnd.nextInt(strPool.length))
        O(s"'$v'", s"'$v'", None)
    }
  }

  private def dateLit(rnd: Random): String = {
    val y = 1993 + rnd.nextInt(9)
    val m = 1 + rnd.nextInt(12)
    val d = 1 + rnd.nextInt(28)
    f"$y%04d-$m%02d-$d%02d"
  }
}
