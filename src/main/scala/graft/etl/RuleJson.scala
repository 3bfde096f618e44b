package graft.etl

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** JSON round-trip for the pipeline spec.
  *
  * Live schema (what the reference app exports/imports, main.py:327-339;
  * field names set at main.py:349-352, 386-389, 396-401): a JSON array of
  * flat rule objects —
  *   {"name":..,"type":"Direct Map","source":..}
  *   {"name":..,"type":"Conditional","expression":..,"then":..,"else":..}
  *   {"name":..,"type":"Lookup","map_name":..,"in_col":..,"key_col":..,"val_col":..}
  *
  * Legacy schema (examples.json:1-7, no longer read by the live app) is
  * accepted on import and converted: {"output_columns":[{"name",
  * "lookup":{mapping_file,input_col,key_col,target_col}} |
  * {"name","condition":{"if":[{input_col,operator,value}],then,else}}]}.
  */
object RuleJson {

  private val mapper = new ObjectMapper()

  /** Parse a pipeline spec (live or legacy schema). Unparseable rules are
    * returned as error strings; the rest load (report-and-continue). */
  def parse(json: String): (Seq[Rule], Seq[String]) = {
    val root = mapper.readTree(json)
    if (root.isArray) parseLive(root.asInstanceOf[ArrayNode])
    else if (root.has("output_columns")) parseLegacy(root)
    else (Seq.empty, Seq(s"unrecognized pipeline spec shape: ${root.getNodeType}"))
  }

  /** Serialize rules in the live schema, round-trippable through the
    * reference app's import (main.py:327-339). */
  def toJson(rules: Seq[Rule]): String = {
    val arr = mapper.createArrayNode()
    rules.foreach { r =>
      val o = arr.addObject()
      r match {
        case DirectMap(name, source) =>
          o.put("name", name).put("type", "Direct Map").put("source", source)
        case Conditional(name, expression, thenV, elseV) =>
          o.put("name", name).put("type", "Conditional").put("expression", expression)
            .put("then", thenV).put("else", elseV)
        case Lookup(name, mapName, inCol, keyCol, valCol) =>
          o.put("name", name).put("type", "Lookup").put("map_name", mapName)
            .put("in_col", inCol).put("key_col", keyCol).put("val_col", valCol)
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
  }

  private def parseLive(arr: ArrayNode): (Seq[Rule], Seq[String]) = {
    val rules = Vector.newBuilder[Rule]
    val errors = Vector.newBuilder[String]
    arr.elements().asScala.zipWithIndex.foreach { case (node, i) =>
      def str(f: String): Option[String] =
        Option(node.get(f)).filter(_.isTextual).map(_.asText())
      val parsed = str("type") match {
        case Some("Direct Map") =>
          for { n <- str("name"); s <- str("source") } yield DirectMap(n, s)
        case Some("Conditional") =>
          for { n <- str("name"); e <- str("expression"); t <- str("then"); el <- str("else") }
            yield Conditional(n, e, t, el)
        case Some("Lookup") =>
          for {
            n <- str("name"); m <- str("map_name"); in <- str("in_col")
            k <- str("key_col"); v <- str("val_col")
          } yield Lookup(n, m, in, k, v)
        case other => errors += s"rule[$i]: unknown type $other"; None
      }
      parsed match {
        case Some(r) => rules += r
        case None if str("type").exists(Set("Direct Map", "Conditional", "Lookup")) =>
          errors += s"rule[$i]: missing required fields for type ${str("type").get}"
        case None => ()
      }
    }
    (rules.result(), errors.result())
  }

  private def parseLegacy(root: JsonNode): (Seq[Rule], Seq[String]) = {
    val rules = Vector.newBuilder[Rule]
    val errors = Vector.newBuilder[String]
    root.get("output_columns").elements().asScala.zipWithIndex.foreach { case (node, i) =>
      val name = Option(node.get("name")).map(_.asText()).getOrElse(s"col_$i")
      if (node.has("lookup")) {
        val lk = node.get("lookup")
        rules += Lookup(name, lk.get("mapping_file").asText(), lk.get("input_col").asText(),
          lk.get("key_col").asText(), lk.get("target_col").asText())
      } else if (node.has("condition")) {
        val c = node.get("condition")
        val clauses = c.get("if").elements().asScala.map { cl =>
          val v = cl.get("value")
          val lit = if (v.isTextual) "'" + v.asText() + "'" else v.asText()
          s"(`${cl.get("input_col").asText()}` ${cl.get("operator").asText()} $lit)"
        }.toSeq
        rules += Conditional(name, clauses.mkString(" & "),
          c.get("then").asText(), c.get("else").asText())
      } else errors += s"output_columns[$i]: neither lookup nor condition"
    }
    (rules.result(), errors.result())
  }
}
