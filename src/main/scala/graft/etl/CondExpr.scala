package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Translator for the reference's Conditional-rule expression grammar
  * (pandas `DataFrame.eval` subset, as emitted by the formula builder —
  * reference: main.py:354-389):
  *
  *   atom   := '(' expr ')' | operand cmp operand
  *   expr   := atom (('&' | '|') atom)*          -- left-associative
  *   cmp    := '==' | '!=' | '>=' | '<=' | '>' | '<'
  *   operand:= `backtick col` | bareIdent | number | 'str' | "str"
  *
  * pandas requires the fully-parenthesized form the builder always emits
  * (e.g. ``(`Amount` > 500) & (`Status` == 'Active')``); we additionally
  * honor standard precedence (& binds tighter than |) for hand-written
  * specs.
  *
  * Translation is SCHEMA-AWARE to reproduce Python comparison semantics
  * (pandas eval with engine='python'):
  *  - null comparisons: `NaN > 500` is False => else-branch; Spark
  *    `null > 500` is null => `otherwise` — matches with no special case.
  *  - cross-type: `strCol == 42` is elementwise False (not an error),
  *    `strCol != 42` is True, but `strCol > 42` raises TypeError => the
  *    rule fails and is skipped. Spark's ANSI mode would instead throw a
  *    runtime cast error at action time — poisoning the whole query and
  *    breaking per-rule error isolation — so mismatches must be resolved
  *    at translation time.
  *  - bools are ints in Python: `boolCol > 0.5` compares 0/1.
  *  - datetime columns compare against string literals (pandas parses
  *    the string; Spark's implicit string->timestamp cast matches).
  */
object CondExpr {

  /** Parse + typecheck the expression against `schema`, producing a Spark
    * Column, or an error message (the engine then skips the rule,
    * reference main.py:152-157). */
  def translate(expression: String, schema: StructType): Either[String, Column] =
    try Right(build(new Parser(expression).parseAll(), schema))
    catch { case e: TranslateException => Left(e.getMessage) }

  private final class TranslateException(msg: String) extends RuntimeException(msg)
  private def fail(msg: String): Nothing = throw new TranslateException(msg)

  // --- AST -----------------------------------------------------------------
  private sealed trait Ast
  private final case class AndA(l: Ast, r: Ast) extends Ast
  private final case class OrA(l: Ast, r: Ast) extends Ast
  private final case class Cmp(l: Operand, op: String, r: Operand) extends Ast

  private sealed trait Operand
  private final case class ColRef(name: String) extends Operand
  private final case class NumL(value: Double, integral: Boolean) extends Operand
  private final case class StrL(value: String) extends Operand
  private final case class BoolL(value: Boolean) extends Operand

  // --- typed build ---------------------------------------------------------
  private sealed trait Cat
  private case object CNum extends Cat
  private case object CStr extends Cat
  private case object CBool extends Cat
  private case object CTime extends Cat

  private def catOf(dt: DataType): Cat = dt match {
    case _: NumericType => CNum
    case StringType => CStr
    case BooleanType => CBool
    case _: TimestampType | DateType | TimestampNTZType => CTime
    case other => fail(s"unsupported column type $other in condition")
  }

  private def build(ast: Ast, schema: StructType): Column = ast match {
    case AndA(l, r) => build(l, schema) && build(r, schema)
    case OrA(l, r) => build(l, schema) || build(r, schema)
    case Cmp(l, op, r) => buildCmp(l, op, r, schema)
  }

  private def resolve(o: Operand, schema: StructType): (Column, Cat) = o match {
    case ColRef(name) =>
      val field = schema.fields.find(_.name == name)
        .getOrElse(fail(s"column '$name' not found"))
      (col(quoteIfNeeded(name)), catOf(field.dataType))
    case NumL(v, integral) =>
      (if (integral && v.isValidInt) lit(v.toLong) else lit(v), CNum)
    case StrL(v) => (lit(v), CStr)
    case BoolL(v) => (lit(v), CBool)
  }

  private def buildCmp(l: Operand, op: String, r: Operand, schema: StructType): Column = {
    val (lc0, lcat0) = resolve(l, schema)
    val (rc0, rcat0) = resolve(r, schema)
    // Python bools are ints: compare as 0/1 when the other side is numeric
    val (lc, lcat) = if (lcat0 == CBool && rcat0 == CNum) (lc0.cast("int"), CNum) else (lc0, lcat0)
    val (rc, rcat) = if (rcat0 == CBool && lcat0 == CNum) (rc0.cast("int"), CNum) else (rc0, rcat0)
    val compatible = (lcat, rcat) match {
      case (a, b) if a == b => true
      case (CTime, CStr) | (CStr, CTime) => true // pandas parses the string
      case _ => false
    }
    if (compatible) applyOp(lc, op, rc)
    else op match {
      // Python cross-type equality is elementwise False / inequality True
      case "==" => lit(false)
      case "!=" => lit(true)
      // Python cross-type ordering raises TypeError -> rule fails
      case _ => fail(s"TypeError: '$op' not supported between ${name(lcat)} and ${name(rcat)}")
    }
  }

  private def name(c: Cat): String = c match {
    case CNum => "number"; case CStr => "str"; case CBool => "bool"; case CTime => "datetime"
  }

  private def applyOp(l: Column, op: String, r: Column): Column = op match {
    case "==" => l === r
    case "!=" => l =!= r
    case ">" => l > r
    case "<" => l < r
    case ">=" => l >= r
    case "<=" => l <= r
  }

  private def quoteIfNeeded(n: String): String =
    if (n.forall(ch => ch.isLetterOrDigit || ch == '_')) n
    else "`" + n.replace("`", "``") + "`"

  // --- tokenizer -----------------------------------------------------------
  private sealed trait Tok
  private case object LPar extends Tok
  private case object RPar extends Tok
  private case object Amp extends Tok
  private case object Bar extends Tok
  private final case class CmpOp(op: String) extends Tok
  private final case class IdentT(name: String) extends Tok
  private final case class NumT(value: Double, isIntegral: Boolean) extends Tok
  private final case class StrT(value: String) extends Tok
  private final case class BoolT(value: Boolean) extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '(' => out += LPar; i += 1
        case ')' => out += RPar; i += 1
        case '&' => out += Amp; i += 1
        case '|' => out += Bar; i += 1
        case '`' =>
          val end = s.indexOf('`', i + 1)
          if (end < 0) fail(s"unterminated backtick identifier at offset $i")
          out += IdentT(s.substring(i + 1, end)); i = end + 1
        case '\'' | '"' =>
          val end = s.indexOf(c, i + 1)
          if (end < 0) fail(s"unterminated string literal at offset $i")
          out += StrT(s.substring(i + 1, end)); i = end + 1
        case '=' | '!' | '>' | '<' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += CmpOp(s.substring(i, i + 2)); i += 2 }
          else if (c == '>' || c == '<') { out += CmpOp(c.toString); i += 1 }
          else fail(s"unexpected '$c' at offset $i")
        case d if d.isDigit || d == '-' || d == '.' =>
          val start = i
          i += 1
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
            s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
            ((s.charAt(i) == '+' || s.charAt(i) == '-') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
          val text = s.substring(start, i)
          val v = try text.toDouble catch { case _: NumberFormatException => fail(s"bad number '$text'") }
          out += NumT(v, !text.exists(ch => ch == '.' || ch == 'e' || ch == 'E'))
        case a if a.isLetter || a == '_' =>
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          s.substring(start, i) match {
            case "True" | "true" => out += BoolT(true)
            case "False" | "false" => out += BoolT(false)
            case n => out += IdentT(n)
          }
        case other => fail(s"unexpected character '$other' at offset $i")
      }
    }
    out.result()
  }

  // --- recursive-descent parser -------------------------------------------
  private final class Parser(input: String) {
    private val toks = tokenize(input)
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length) fail("unexpected end of expression")
      val t = toks(pos); pos += 1; t
    }

    def parseAll(): Ast = {
      if (toks.isEmpty) fail("empty expression")
      val c = parseOr()
      if (pos != toks.length) fail(s"trailing tokens at ${toks(pos)}")
      c
    }

    private def parseOr(): Ast = {
      var left = parseAnd()
      while (peek.contains(Bar)) { next(); left = OrA(left, parseAnd()) }
      left
    }

    private def parseAnd(): Ast = {
      var left = parseAtom()
      while (peek.contains(Amp)) { next(); left = AndA(left, parseAtom()) }
      left
    }

    private def parseAtom(): Ast = peek match {
      case Some(LPar) =>
        next()
        // '(' may open a grouped boolean expr or a parenthesized comparison;
        // parseOr handles both since a comparison is an Or of one And of one atom.
        val inner = parseOr()
        next() match {
          case RPar => inner
          case t => fail(s"expected ')' but got $t")
        }
      case _ => parseComparison()
    }

    private def parseComparison(): Ast = {
      val lhs = parseOperand()
      next() match {
        case CmpOp(op) => Cmp(lhs, op, parseOperand())
        case t => fail(s"expected comparison operator but got $t")
      }
    }

    private def parseOperand(): Operand = next() match {
      case IdentT(n) => ColRef(n)
      case NumT(v, integral) => NumL(v, integral)
      case StrT(v) => StrL(v)
      case BoolT(v) => BoolL(v)
      case t => fail(s"expected column or literal but got $t")
    }
  }
}
