package graft.etl

import org.scalatest.funsuite.AnyFunSuite

class RuleJsonSpec extends AnyFunSuite {

  test("live schema round-trips") {
    val rules = Seq(
      DirectMap("a", "src_a"),
      Conditional("p", "(`amount` > 1000)", "VIP", "Regular"),
      Lookup("n", "dim", "in_c", "key_c", "val_c"))
    val (parsed, errs) = RuleJson.parse(RuleJson.toJson(rules))
    assert(errs.isEmpty)
    assert(parsed === rules)
  }

  test("legacy examples.json schema converts (examples.json:1-7)") {
    val legacy =
      """{"output_columns": [
        |  {"name": "CustomerName", "lookup": {"mapping_file": "customer_mapping",
        |    "input_col": "cust_id", "key_col": "id", "target_col": "name"}},
        |  {"name": "Priority", "condition": {"if": [{"input_col": "amount",
        |    "operator": ">", "value": 1000}], "then": "VIP", "else": "Regular"}}
        |]}""".stripMargin
    val (rules, errs) = RuleJson.parse(legacy)
    assert(errs.isEmpty)
    assert(rules === Seq(
      Lookup("CustomerName", "customer_mapping", "cust_id", "id", "name"),
      Conditional("Priority", "(`amount` > 1000)", "VIP", "Regular")))
  }

  test("unknown rule types are reported, valid ones still parse") {
    val json =
      """[{"name":"ok","type":"Direct Map","source":"c"},
        |{"name":"bad","type":"Mystery"}]""".stripMargin
    val (rules, errs) = RuleJson.parse(json)
    assert(rules === Seq(DirectMap("ok", "c")))
    assert(errs.nonEmpty)
  }

  test("missing fields on a known type are reported") {
    val (rules, errs) = RuleJson.parse("""[{"name":"x","type":"Conditional"}]""")
    assert(rules.isEmpty)
    assert(errs.exists(_.contains("missing required fields")))
  }
}
