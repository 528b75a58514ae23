package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational-operator coverage (SURVEY §2.4) over the TPC-H-ish tables:
  * scan + pushdown, projection/filter, equi/semi/anti/broadcast joins,
  * partial+final aggregation, distinct agg, window functions, top-k,
  * set ops. Each query is written the way it should run at 100 TB:
  * filters/projections reachable by the parquet scan, small dimension
  * sides broadcast, aggregations map-side-combinable.
  *
  * Money sums are rounded to 2 dp (double accumulation order differs
  * between engines; 1e-7-scale error vs 5e-3 rounding granularity),
  * averages to 6 dp.
  */
object RelQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, d: String, n: String) = Tables.table(s, d, n)

  val entries: Seq[(String, Q, Option[String])] = Seq(

    // TPC-H Q1 analogue: scan + filter pushdown + 8-fold agg
    ("q01_pricing_summary",
      ((s, d) => {
        val li = t(s, d, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            round(avg(col("l_extendedprice")), 6).as("avg_price"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy("l_returnflag", "l_linestatus")
      }): Q,
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  round(avg(l_extendedprice), 6) AS avg_price,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // selective filter + 2-column projection (pushdown/pruning showcase)
    ("q02_filter_project",
      ((s, d) => {
        t(s, d, "lineitem")
          .filter(col("l_discount") >= 0.05 && col("l_quantity") < 10)
          .select(col("l_orderkey"), round(col("l_extendedprice") * col("l_discount"), 6).as("disc_amount"))
          .orderBy(col("l_orderkey"), col("disc_amount"))
      }): Q,
      Some("""SELECT l_orderkey, round(l_extendedprice * l_discount, 6) AS disc_amount
             |FROM lineitem WHERE l_discount >= 0.05 AND l_quantity < 10
             |ORDER BY l_orderkey, disc_amount""".stripMargin)),

    // broadcast join: fact x small dim
    ("q03_revenue_by_segment",
      ((s, d) => {
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy("c_mktsegment")
      }): Q,
      Some("""SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
             |  count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // multi-way join through the dimension chain (TPC-H Q5 analogue)
    ("q04_revenue_by_nation",
      ((s, d) => {
        val li = t(s, d, "lineitem")
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val n = t(s, d, "nation")
        val r = t(s, d, "region")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy("r_name", "n_name")
      }): Q,
      Some("""SELECT r_name, n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin)),

    // top-k by aggregate (rank + filter)
    ("q05_top_customers",
      ((s, d) => {
        val o = t(s, d, "orders")
        val c = t(s, d, "customer")
        val rev = o.groupBy(col("o_custkey"))
          .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
        // top-10 BEFORE the name join: TakeOrdered on the aggregate
        // (distributed top-n), then broadcast the 10 winners against
        // customer — never a global-sort window, and the big customer
        // table is the probe side, not a broadcast
        val top = rev.orderBy(col("revenue").desc, col("o_custkey").asc)
          .limit(10)
          // rank the 10 surviving rows; the non-foldable constant key
          // (a literal gets folded away) keeps the harmless 10-row
          // window off the empty-partition warn path
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("o_custkey") % 1)
              .orderBy(col("revenue").desc, col("o_custkey").asc)))
        broadcast(top).join(c, top("o_custkey") === c("c_custkey"))
          .select("c_custkey", "c_name", "revenue", "rnk")
          .orderBy("rnk")
      }): Q,
      Some("""SELECT c_custkey, c_name, revenue, rnk FROM (
             |  SELECT c_custkey, c_name, revenue,
             |    row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rnk
             |  FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue
             |        FROM orders GROUP BY o_custkey) r
             |  JOIN customer ON o_custkey = c_custkey)
             |WHERE rnk <= 10 ORDER BY rnk""".stripMargin)),

    // window: running sum + lag per partition
    ("q06_running_supplier",
      ((s, d) => {
        val li = t(s, d, "lineitem")
        li.filter(col("l_suppkey") <= 10)
          .select(col("l_suppkey"), col("l_shipdate"), col("l_quantity"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("running_qty", round(sum(col("l_quantity")).over(
            Window.partitionBy("l_suppkey")
              .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
              .rowsBetween(Window.unboundedPreceding, 0)), 2))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      }): Q,
      Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
             |  round(sum(l_quantity) OVER (
             |    PARTITION BY l_suppkey
             |    ORDER BY l_shipdate, l_orderkey, l_linenumber
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
             |FROM lineitem WHERE l_suppkey <= 10
             |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin)),

    // distinct aggregation
    ("q07_distinct_parts",
      ((s, d) => {
        t(s, d, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"))
          .orderBy("l_returnflag")
      }): Q,
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // semi join (EXISTS)
    ("q08_customers_with_urgent",
      ((s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }): Q,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |ORDER BY c_custkey""".stripMargin)),

    // anti join (NOT EXISTS)
    ("q09_customers_no_orders",
      ((s, d) => {
        val c = t(s, d, "customer")
        val o = t(s, d, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      }): Q,
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // set op: UNION (dedup) of name sets
    ("q10_union_keys",
      ((s, d) => {
        val a = t(s, d, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_nationkey").as("nationkey"))
        val b = t(s, d, "supplier").filter(col("s_acctbal") > 9000)
          .select(col("s_nationkey").as("nationkey"))
        a.union(b).distinct().orderBy("nationkey")
      }): Q,
      Some("""SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
             |UNION
             |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
             |ORDER BY nationkey""".stripMargin)),

    // INTERSECT
    ("q11_intersect_keys",
      ((s, d) => {
        val a = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        val b = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
        a.intersect(b).orderBy("nationkey")
      }): Q,
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT
             |SELECT s_nationkey AS nationkey FROM supplier
             |ORDER BY nationkey""".stripMargin)),

    // rollup (grouping sets)
    ("q12_rollup_priority",
      ((s, d) => {
        t(s, d, "orders")
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
          .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      }): Q,
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)),

    // date bucketing on the orders time axis (epoch-month key)
    ("q13_monthly_orders",
      ((s, d) => {
        t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("revenue"))
          .orderBy("month")
      }): Q,
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders GROUP BY 1 ORDER BY month""".stripMargin)),

    // join + conditional agg (CASE pivot)
    ("q14_promo_share",
      ((s, d) => {
        val li = t(s, d, "lineitem")
        val p = t(s, d, "part")
        li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
          .agg(round(
            sum(when(col("p_type").startsWith("PROMO"),
              col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0)) * 100.0 /
              sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6).as("promo_share"))
      }): Q,
      Some("""SELECT round(
             |  sum(CASE WHEN p_type LIKE 'PROMO%'
             |      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) * 100.0 /
             |  sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share
             |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin))
  )

  def queries: Map[String, Q] = entries.map(e => e._1 -> e._2).toMap
  def oracles: Map[String, String] =
    entries.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
