package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{Joins, Ranges}

/** Plane-A relational operators (SURVEY §2.A) expressed over the
  * driver's TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Determinism rules used throughout (the driver hash-compares against
  * DuckDB):
  *  - every result has a total ORDER BY;
  *  - double sums over many rows go through DECIMAL(18,2) so the result
  *    is order-independent and engine-exact, then back to DOUBLE;
  *  - integral-valued doubles (l_quantity) sum exactly as doubles;
  *  - ties in top-k are broken by a unique key.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact, order-independent sum of a 2-decimal double column. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A15 hash aggregate: sum/avg/count, grouped. (TPC-H Q1 shape.)
    "q01_agg_groupby" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_price"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A1/A5/A6 scan + projection + OR-of-ranges predicate + LIKE.
    "q02_filter_ranges" -> ((s, dir) => {
      val pred = Ranges.rangesPredicate(
        col("o_orderkey"),
        Seq((Some(1000L), Some(20000L)), (Some(50000L), None)))
      t(s, dir, "orders")
        .filter(pred && col("o_orderpriority").like("1-%"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // A8 IN-subquery as LEFT SEMI join.
    "q03_semi_join" -> ((s, dir) => {
      val bld = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("o_custkey"))
      t(s, dir, "orders")
        .join(bld, Seq("o_custkey"), "left_semi")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),

    // A9 NOT-IN as LEFT ANTI join (the reference's unprocessed-work idiom).
    "q04_anti_join" -> ((s, dir) => {
      val custWithOrders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      t(s, dir, "customer")
        .join(custWithOrders, Seq("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // A10 ANY LEFT JOIN: attach at most one lineitem per order
    // (first by l_linenumber), never multiplying the left side.
    "q05_any_left_join" -> ((s, dir) => {
      val right = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey"),
          col("l_linenumber"), col("l_quantity"))
      Joins.anyJoin(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_orderstatus")),
        right, Seq("o_orderkey"), "left",
        // (l_orderkey, l_linenumber) is NOT unique in this data — the
        // full tuple is, so the tiebreak must include all columns for a
        // deterministic ANY-join pick.
        tiebreak = Seq(col("l_linenumber"), col("l_partkey"), col("l_quantity")))
        .select(col("o_orderkey"), col("o_orderstatus"), col("l_linenumber"),
          col("l_quantity"), col("l_partkey"))
        .orderBy(col("o_orderkey"))
    }),

    // A21 top-k with deterministic tiebreak.
    "q06_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),

    // A19/A20 UNION ALL + DISTINCT (the balances address-universe idiom).
    "q07_union_distinct" -> ((s, dir) => {
      val a = t(s, dir, "orders").select(col("o_custkey").as("k"))
      val b = t(s, dir, "customer").select(col("c_custkey").as("k"))
      val c = t(s, dir, "supplier").select(col("s_suppkey").as("k"))
      a.unionByName(b).unionByName(c).distinct().orderBy(col("k"))
    }),

    // A16 grouped count-distinct + A18 computed grouping key.
    "q08_count_distinct" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy((floor(col("user_id") / 100) * 100).cast("long").as("user_bucket"))
        .agg(
          countDistinct(col("event_type")).as("n_types"),
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n"))
        .orderBy(col("user_bucket"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_groupby" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         sum(l_quantity) / count(*) AS avg_qty,
         count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_filter_ranges" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
         WHERE ((o_orderkey >= 1000 AND o_orderkey < 20000) OR o_orderkey >= 50000)
           AND o_orderpriority LIKE '1-%'
         ORDER BY o_orderkey""",
    "q03_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
         GROUP BY 1 ORDER BY 1""",
    "q04_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
         WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
         GROUP BY 1 ORDER BY 1""",
    "q05_any_left_join" ->
      """SELECT o_orderkey, o_orderstatus, l_linenumber, l_quantity, l_partkey
         FROM orders LEFT JOIN (
           SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM (
             SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
                    row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
             FROM lineitem) WHERE rn = 1) li
         ON o_orderkey = li.l_orderkey
         ORDER BY o_orderkey""",
    "q06_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q07_union_distinct" ->
      """SELECT DISTINCT k FROM (
           SELECT o_custkey AS k FROM orders
           UNION ALL SELECT c_custkey AS k FROM customer
           UNION ALL SELECT s_suppkey AS k FROM supplier)
         ORDER BY k""",
    "q08_count_distinct" ->
      """SELECT CAST(floor(user_id / 100) * 100 AS BIGINT) AS user_bucket,
         count(DISTINCT event_type) AS n_types,
         count(DISTINCT user_id) AS n_users,
         count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1"""
  )
}
