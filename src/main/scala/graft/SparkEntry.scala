package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2; each has a
  * DuckDB-equivalent SQL in `oracleSql` (same output column names — the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the full reference pipeline shape (Direct Map + Conditional
    * + Lookup compiled to one plan) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("etl_pipeline_json")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity: rule engine (SURVEY.md §2.2) ------------------
    "etl_direct_map" -> { (s, dir) =>
      val orders = Tables(s, dir, "orders")
      RuleCompiler.run(orders, Seq(
        DirectMap("order_id", "o_orderkey"),
        DirectMap("status", "o_orderstatus"),
        DirectMap("total", "o_totalprice")), Map.empty).output
    },
    "etl_conditional" -> { (s, dir) =>
      val orders = Tables(s, dir, "orders")
      RuleCompiler.run(orders, Seq(
        DirectMap("order_id", "o_orderkey"),
        Conditional("priority", "(`o_totalprice` > 1000)", "VIP", "Regular"),
        Conditional("flagged", "(`o_totalprice` > 50000) | (`o_orderstatus` == 'F')", "Y", "N")),
        Map.empty).output
    },
    "etl_lookup" -> { (s, dir) =>
      val customer = Tables(s, dir, "customer")
      val nation = Tables(s, dir, "nation")
      RuleCompiler.run(customer, Seq(
        DirectMap("cust_id", "c_custkey"),
        Lookup("nation_name", "nation", "c_nationkey", "n_nationkey", "n_name")),
        Map("nation" -> nation)).output
    },
    "etl_pipeline_json" -> { (s, dir) =>
      // Full path: JSON spec (live schema, main.py:327-339) -> Rule ADT ->
      // one compiled plan over orders with a broadcast customer lookup.
      val spec =
        """[
          |{"name":"order_id","type":"Direct Map","source":"o_orderkey"},
          |{"name":"total","type":"Direct Map","source":"o_totalprice"},
          |{"name":"priority","type":"Conditional",
          | "expression":"(`o_totalprice` > 1000) | (`o_orderstatus` == 'F')",
          | "then":"VIP","else":"Regular"},
          |{"name":"segment","type":"Lookup","map_name":"customer",
          | "in_col":"o_custkey","key_col":"c_custkey","val_col":"c_mktsegment"}
          |]""".stripMargin
      val (rules, _) = RuleJson.parse(spec)
      RuleCompiler.run(Tables(s, dir, "orders"), rules,
        Map("customer" -> Tables(s, dir, "customer"))).output
    },
  )

  def oracleSql: Map[String, String] = Map(
    "etl_direct_map" ->
      "SELECT o_orderkey AS order_id, o_orderstatus AS status, o_totalprice AS total FROM orders",
    "etl_conditional" ->
      """SELECT o_orderkey AS order_id,
        | CASE WHEN o_totalprice > 1000 THEN 'VIP' ELSE 'Regular' END AS priority,
        | CASE WHEN (o_totalprice > 50000) OR (o_orderstatus = 'F') THEN 'Y' ELSE 'N' END AS flagged
        |FROM orders""".stripMargin,
    "etl_lookup" ->
      """SELECT c_custkey AS cust_id, m.n_name AS nation_name
        |FROM customer LEFT JOIN
        | (SELECT CAST(n_nationkey AS VARCHAR) AS k, n_name FROM nation) m
        | ON CAST(c_nationkey AS VARCHAR) = m.k""".stripMargin,
    "etl_pipeline_json" ->
      """SELECT o_orderkey AS order_id, o_totalprice AS total,
        | CASE WHEN (o_totalprice > 1000) OR (o_orderstatus = 'F') THEN 'VIP' ELSE 'Regular' END AS priority,
        | m.c_mktsegment AS segment
        |FROM orders LEFT JOIN
        | (SELECT CAST(c_custkey AS VARCHAR) AS k, c_mktsegment FROM customer) m
        | ON CAST(o_custkey AS VARCHAR) = m.k""".stripMargin,
  )
}
