package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Translator for the reference's Conditional-rule expression grammar
  * (pandas `DataFrame.eval` subset, as emitted by the formula builder —
  * reference: main.py:354-389):
  *
  *   expr   := and ('|' and)*                    -- left-associative
  *   and    := unary ('&' unary)*
  *   unary  := '~' unary | '(' expr ')' | comparison
  *   cmp    := '==' | '!=' | '>=' | '<=' | '>' | '<'
  *   comparison := sum cmp sum
  *   sum    := product (('+' | '-') product)*
  *   product:= value (('*' | '/') value)*
  *   value  := `backtick col` | bareIdent | number | 'str' | "str" | '(' sum ')'
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
  private final case class NotA(x: Ast) extends Ast
  private final case class Cmp(l: Operand, op: String, r: Operand) extends Ast

  private sealed trait Operand
  private final case class ColRef(name: String) extends Operand
  private final case class NumL(value: Double, integral: Boolean) extends Operand
  private final case class StrL(value: String) extends Operand
  private final case class BoolL(value: Boolean) extends Operand
  private final case class Arith(l: Operand, op: String, r: Operand) extends Operand

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
    // pandas `~mask` of a NaN-compare is ~False = True; Spark !null is
    // null => otherwise-branch, which maps to False. Coalesce keeps the
    // Python behavior: the inner comparison's null means "False", so its
    // negation must be True.
    case NotA(x) => !coalesce(build(x, schema), lit(false))
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
    case Arith(l, op, r) =>
      val (lc0, lcat0) = resolve(l, schema)
      val (rc0, rcat0) = resolve(r, schema)
      // Python: bools are ints under arithmetic; '+' concatenates strings
      val (lc, lcat) = if (lcat0 == CBool) (lc0.cast("int"), CNum) else (lc0, lcat0)
      val (rc, rcat) = if (rcat0 == CBool) (rc0.cast("int"), CNum) else (rc0, rcat0)
      (lcat, rcat, op) match {
        case (CNum, CNum, "+") => (lc + rc, CNum)
        case (CNum, CNum, "-") => (lc - rc, CNum)
        case (CNum, CNum, "*") => (lc * rc, CNum)
        case (CNum, CNum, "/") => (lc / rc, CNum)
        case (CStr, CStr, "+") => (concat(lc, rc), CStr)
        case _ => fail(s"TypeError: '$op' not supported between ${name(lcat)} and ${name(rcat)}")
      }
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
  private case object Tilde extends Tok
  private final case class ArithOp(op: String) extends Tok
  private final case class CmpOp(op: String) extends Tok
  private final case class IdentT(name: String) extends Tok
  private final case class NumT(value: Double, isIntegral: Boolean) extends Tok
  private final case class StrT(value: String) extends Tok
  private final case class BoolT(value: Boolean) extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    var last: Tok = null // previous significant token, for unary-minus detection
    def push(t: Tok): Unit = { out += t; last = t }
    // '-' begins a numeric literal only in prefix position (start, after an
    // opening paren or any operator); after an operand it is binary minus.
    def minusIsSign: Boolean = last match {
      case null | LPar | Amp | Bar | Tilde | ArithOp(_) | CmpOp(_) => true
      case _ => false
    }
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case ' ' | '\t' | '\n' | '\r' => i += 1
        case '(' => push(LPar); i += 1
        case ')' => push(RPar); i += 1
        case '&' => push(Amp); i += 1
        case '|' => push(Bar); i += 1
        case '~' => push(Tilde); i += 1
        case '+' | '*' | '/' => push(ArithOp(c.toString)); i += 1
        case '-' if !minusIsSign => push(ArithOp("-")); i += 1
        case '`' =>
          val end = s.indexOf('`', i + 1)
          if (end < 0) fail(s"unterminated backtick identifier at offset $i")
          push(IdentT(s.substring(i + 1, end))); i = end + 1
        case '\'' | '"' =>
          val end = s.indexOf(c, i + 1)
          if (end < 0) fail(s"unterminated string literal at offset $i")
          push(StrT(s.substring(i + 1, end))); i = end + 1
        case '=' | '!' | '>' | '<' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '=') { push(CmpOp(s.substring(i, i + 2))); i += 2 }
          else if (c == '>' || c == '<') { push(CmpOp(c.toString)); i += 1 }
          else fail(s"unexpected '$c' at offset $i")
        case d if d.isDigit || d == '-' || d == '.' =>
          val start = i
          i += 1
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
            s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
            ((s.charAt(i) == '+' || s.charAt(i) == '-') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
          val text = s.substring(start, i)
          val v = try text.toDouble catch { case _: NumberFormatException => fail(s"bad number '$text'") }
          push(NumT(v, !text.exists(ch => ch == '.' || ch == 'e' || ch == 'E')))
        case a if a.isLetter || a == '_' =>
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          s.substring(start, i) match {
            case "True" | "true" => push(BoolT(true))
            case "False" | "false" => push(BoolT(false))
            case n => push(IdentT(n))
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
      var left = parseUnary()
      while (peek.contains(Amp)) { next(); left = AndA(left, parseUnary()) }
      left
    }

    private def parseUnary(): Ast = peek match {
      case Some(Tilde) => next(); NotA(parseUnary())
      case _ => parseAtom()
    }

    private def parseAtom(): Ast = peek match {
      case Some(LPar) =>
        // '(' may open a grouped boolean expr — (`a` > 1) & ... — or a
        // parenthesized arithmetic operand — (`a` + 1) > 2. Try the
        // boolean reading first and backtrack on failure.
        val mark = pos
        try {
          next()
          val inner = parseOr()
          next() match {
            case RPar => inner
            case t => fail(s"expected ')' but got $t")
          }
        } catch {
          case _: TranslateException =>
            pos = mark
            parseComparison()
        }
      case _ => parseComparison()
    }

    private def parseComparison(): Ast = {
      val lhs = parseSum()
      next() match {
        case CmpOp(op) => Cmp(lhs, op, parseSum())
        case t => fail(s"expected comparison operator but got $t")
      }
    }

    private def parseSum(): Operand = {
      var left = parseProduct()
      while (peek.exists { case ArithOp("+") | ArithOp("-") => true; case _ => false }) {
        val ArithOp(op) = next(): @unchecked
        left = Arith(left, op, parseProduct())
      }
      left
    }

    private def parseProduct(): Operand = {
      var left = parseValue()
      while (peek.exists { case ArithOp("*") | ArithOp("/") => true; case _ => false }) {
        val ArithOp(op) = next(): @unchecked
        left = Arith(left, op, parseValue())
      }
      left
    }

    private def parseValue(): Operand = next() match {
      case IdentT(n) => ColRef(n)
      case NumT(v, integral) => NumL(v, integral)
      case StrT(v) => StrL(v)
      case BoolT(v) => BoolL(v)
      case LPar =>
        val inner = parseSum()
        next() match {
          case RPar => inner
          case t => fail(s"expected ')' after arithmetic group but got $t")
        }
      case t => fail(s"expected column or literal but got $t")
    }
  }
}
