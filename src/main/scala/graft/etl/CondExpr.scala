package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

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
  * specs. Null semantics need no special-casing: pandas `NaN > 500` is
  * False => else-branch; Spark `null > 500` is null => `otherwise` — the
  * observable result matches (SURVEY.md §2.2 semantics #4).
  */
object CondExpr {

  /** Parse the expression into a Spark Column, or a parse-error message
    * (the engine skips the rule, reference main.py:152-157). */
  def translate(expression: String): Either[String, Column] =
    try Right(new Parser(expression).parseAll())
    catch { case e: ParseException => Left(e.getMessage) }

  private final class ParseException(msg: String) extends RuntimeException(msg)

  // --- tokenizer -----------------------------------------------------------
  private sealed trait Tok
  private case object LPar extends Tok
  private case object RPar extends Tok
  private case object Amp extends Tok
  private case object Bar extends Tok
  private final case class CmpOp(op: String) extends Tok
  private final case class Ident(name: String) extends Tok
  private final case class NumLit(value: Double, isIntegral: Boolean) extends Tok
  private final case class StrLit(value: String) extends Tok
  private final case class BoolLit(value: Boolean) extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    def err(m: String): Nothing = throw new ParseException(m)
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
          if (end < 0) err(s"unterminated backtick identifier at offset $i")
          out += Ident(s.substring(i + 1, end)); i = end + 1
        case '\'' | '"' =>
          val end = s.indexOf(c, i + 1)
          if (end < 0) err(s"unterminated string literal at offset $i")
          out += StrLit(s.substring(i + 1, end)); i = end + 1
        case '=' | '!' | '>' | '<' =>
          if (i + 1 < s.length && s.charAt(i + 1) == '=') { out += CmpOp(s.substring(i, i + 2)); i += 2 }
          else if (c == '>' || c == '<') { out += CmpOp(c.toString); i += 1 }
          else err(s"unexpected '$c' at offset $i")
        case d if d.isDigit || d == '-' || d == '.' =>
          val start = i
          i += 1
          while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
            s.charAt(i) == 'e' || s.charAt(i) == 'E' ||
            ((s.charAt(i) == '+' || s.charAt(i) == '-') && (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
          val text = s.substring(start, i)
          val v = try text.toDouble catch { case _: NumberFormatException => err(s"bad number '$text'") }
          out += NumLit(v, !text.exists(ch => ch == '.' || ch == 'e' || ch == 'E'))
        case a if a.isLetter || a == '_' =>
          val start = i
          while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
          s.substring(start, i) match {
            case "True" | "true" => out += BoolLit(true)
            case "False" | "false" => out += BoolLit(false)
            case name => out += Ident(name)
          }
        case other => err(s"unexpected character '$other' at offset $i")
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
      if (pos >= toks.length) throw new ParseException("unexpected end of expression")
      val t = toks(pos); pos += 1; t
    }

    def parseAll(): Column = {
      if (toks.isEmpty) throw new ParseException("empty expression")
      val c = parseOr()
      if (pos != toks.length) throw new ParseException(s"trailing tokens at ${toks(pos)}")
      c
    }

    private def parseOr(): Column = {
      var left = parseAnd()
      while (peek.contains(Bar)) { next(); left = left || parseAnd() }
      left
    }

    private def parseAnd(): Column = {
      var left = parseAtom()
      while (peek.contains(Amp)) { next(); left = left && parseAtom() }
      left
    }

    private def parseAtom(): Column = peek match {
      case Some(LPar) =>
        next()
        // '(' may open a grouped boolean expr or a parenthesized comparison;
        // parseOr handles both since a comparison is an Or of one And of one atom.
        val inner = parseOr()
        next() match {
          case RPar => inner
          case t => throw new ParseException(s"expected ')' but got $t")
        }
      case _ => parseComparison()
    }

    private def parseComparison(): Column = {
      val lhs = parseOperand()
      next() match {
        case CmpOp(op) =>
          val rhs = parseOperand()
          op match {
            case "==" => lhs === rhs
            case "!=" => lhs =!= rhs
            case ">" => lhs > rhs
            case "<" => lhs < rhs
            case ">=" => lhs >= rhs
            case "<=" => lhs <= rhs
          }
        case t => throw new ParseException(s"expected comparison operator but got $t")
      }
    }

    private def parseOperand(): Column = next() match {
      case Ident(name) => col(quoteIfNeeded(name))
      case NumLit(v, integral) => if (integral && v.isValidInt) lit(v.toLong) else lit(v)
      case StrLit(v) => lit(v)
      case BoolLit(v) => lit(v)
      case t => throw new ParseException(s"expected column or literal but got $t")
    }

    private def quoteIfNeeded(name: String): String =
      if (name.forall(ch => ch.isLetterOrDigit || ch == '_')) name
      else "`" + name.replace("`", "``") + "`"
  }
}
