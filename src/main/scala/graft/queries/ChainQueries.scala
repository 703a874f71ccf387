package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.Joins
import graft.eth.{Abi, Balances, DerivedViews, Events, Grafana, Selectors, Traces}

/** SURVEY §2 rows not yet exercised by RelationalQueries /
  * TrainingQueries, each over the driver's tables with chain-shaped
  * columns synthesized from integer keys (the q16 pattern): the
  * operator under test is the real library code (Traces / Events /
  * Abi / Joins / Grafana), only the fixture data is synthetic.
  *
  * Determinism rules as in RelationalQueries (total ORDER BY,
  * decimal-cast money sums, unique-key tiebreaks).
  */
object ChainQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Binary-heap path of linenumber k (1..7): the traceAddress fixture
    * for B6/B7 — ancestors of k are k/2, k/4, giving real branching
    * trees (not just chains) out of lineitem rows.
    */
  private val heapPaths = array(
    typedLit(Seq.empty[Int]), typedLit(Seq(0)), typedLit(Seq(1)),
    typedLit(Seq(0, 0)), typedLit(Seq(0, 1)), typedLit(Seq(1, 0)),
    typedLit(Seq(1, 1)))

  /** Synthetic trace table: tx = orderkey, traceAddress = heap path of
    * linenumber, error where quantity < 5. (l_orderkey, l_linenumber)
    * is NOT unique in this data, and a trace tree needs one node per
    * address — dedup to the first row per (orderkey, linenumber) by a
    * full-tuple tiebreak.
    */
  private def syntheticTraces(s: SparkSession, dir: String): DataFrame =
    Joins.firstByKey(t(s, dir, "lineitem"),
      Seq("l_orderkey", "l_linenumber"),
      Seq(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice")))
      .select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_orderkey").cast("string").as("transactionHash"),
      lit(null).cast("string").as("blockHash"),
      when(col("l_quantity") < 5, lit("err")).otherwise(lit(null).cast("string"))
        .as("error"),
      element_at(heapPaths, col("l_linenumber")).as("traceAddress"))

  /** Synthetic internal_transaction table for the batch balances
    * archetype (q47): orders become call traces "tx{k}.{k%3}" (so ~1/3
    * are first traces), every 10-orderkey block gets one block-reward
    * row. Amounts are integer-valued doubles (exact, order-independent
    * sums).
    */
  private def syntheticItx(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val calls = t(s, dir, "orders").select(
      concat(lit("tx"), k.cast("string"), lit("."), (k % 3).cast("string")).as("id"),
      floor(k / 10).cast("long").as("blockNumber"),
      concat(lit("0xa"), (col("o_custkey") % 100).cast("string")).as("from"),
      concat(lit("0xa"), ((col("o_custkey") + 7) % 100).cast("string")).as("to"),
      lit(null).cast("string").as("author"),
      floor(col("o_totalprice")).cast("double").as("value"),
      ((k % 3) + 1).cast("double").as("gasPrice"),
      floor(col("o_totalprice") / 100).cast("double").as("gasUsed"),
      lit("call").as("type"),
      lit(null).cast("string").as("rewardType"))
    val rewards = t(s, dir, "orders")
      .select(floor(k / 10).cast("long").as("blockNumber")).distinct()
      .select(
        concat(lit("b"), col("blockNumber").cast("string"), lit(".r")).as("id"),
        col("blockNumber"),
        lit(null).cast("string").as("from"),
        lit(null).cast("string").as("to"),
        concat(lit("0xa"), (col("blockNumber") % 100).cast("string")).as("author"),
        lit(5.0).as("value"),
        lit(0.0).as("gasPrice"),
        lit(0.0).as("gasUsed"),
        lit("reward").as("type"),
        lit("block").as("rewardType"))
    calls.unionByName(rewards)
  }

  /** The transfer(address,uint256) ABI used by the decode queries. */
  private val transferAbi =
    """[{"type":"function","name":"transfer","inputs":[
         {"name":"dst","type":"address"},{"name":"wad","type":"uint256"}]}]"""

  /** '0x' + 64-hex word of a numeric column (topic/data encoding). */
  private def word64(c: org.apache.spark.sql.Column) =
    concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))

  // Selector blobs for synthetic bytecode (computed from our Keccak at
  // class load — the same constants the MV flags test for).
  private val erc20Blob = Selectors.erc20.values.toSeq.sorted.mkString
  private val erc223Blob = Selectors.erc223.values.toSeq.sorted.mkString
  private val bancorBlob = Selectors.bancorConverter.values.toSeq.sorted.mkString

  /** Synthetic internal_transaction table for the contracts MV:
    * creations at orderkey%3=0, errors at %7=0, parent errors at %11=0,
    * addresses only at even keys (exercising the coalesce(address,id)),
    * bytecode carrying standard selector blobs at %5/%4/%6.
    */
  private def syntheticCreationTraces(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    t(s, dir, "orders").select(
      concat(lit("0xid"), k.cast("string")).as("id"),
      when(k % 3 === 0, lit("create")).otherwise(lit("call")).as("type"),
      when(k % 7 === 0, lit("err")).otherwise(lit(null).cast("string")).as("error"),
      when(k % 11 === 0, lit(true)).otherwise(lit(null).cast("boolean")).as("parent_error"),
      when(k % 2 === 0, concat(lit("0xaddr"), k.cast("string")))
        .otherwise(lit(null).cast("string")).as("address"),
      concat(lit("0xowner"), col("o_custkey").cast("string")).as("from"),
      concat(lit("0x6060"),
        when(k % 5 === 0, lit(erc20Blob)).otherwise(lit("")),
        when(k % 4 === 0, lit(erc223Blob)).otherwise(lit("")),
        when(k % 6 === 0, lit(bancorBlob)).otherwise(lit(""))).as("code"),
      (k / 10).cast("long").as("blockNumber"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A11 ANY INNER JOIN: at most one lineitem per order, inner — the
    // token_holders decimals-join shape (reference token_holders.py:36-41).
    "q30_any_inner_join" -> ((s, dir) => {
      val right = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey"),
          col("l_linenumber"), col("l_quantity"))
      Joins.anyJoin(
        t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice")),
        right, Seq("o_orderkey"), "inner",
        tiebreak = Seq(col("l_linenumber"), col("l_partkey"), col("l_quantity")))
        .select(col("o_orderkey"), col("o_totalprice"), col("l_linenumber"),
          col("l_partkey"), col("l_quantity"))
        .orderBy(col("o_orderkey"))
    }),

    // A7 filter on array element (1-based), the topics[1]=TRANSFER idiom
    // (token_holders.py:42), over split-text token arrays.
    "q31_array_filter" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      t(s, dir, "documents")
        .select(col("doc_id"), toks.as("toks"))
        .filter(element_at(col("toks"), 1) === "the")
        .select(col("doc_id"), element_at(col("toks"), 2).as("second_tok"),
          size(col("toks")).as("n_toks"))
        .orderBy(col("doc_id"))
    }),

    // A14 dictionary join: small dims (region ⋈ nation) broadcast into
    // the fact scan — the block_timestamp hashed-dictionary pattern
    // (clickhouse-config/block_timestamp_dictionary.xml). No shuffle of
    // the customer side for the join itself.
    "q32_broadcast_dict" -> ((s, dir) => {
      val dim = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("c_nationkey"), col("r_name"))
      t(s, dir, "customer")
        .join(broadcast(dim), Seq("c_nationkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), moneySum(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("r_name"))
    }),

    // A23/A10/A20 the true balances.sql composition (4-deep nesting,
    // examples/sql_balances/balances.sql:1-61): address universe from a
    // UNION of roles, then five ANY LEFT JOINed aggregate subqueries,
    // then the clamped arithmetic. Same formula as q17 but exercising
    // the join-composition path instead of conditional aggregation.
    "q33_balances_nested" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def roleSum(tpe: String, as: String) =
        ev.filter(col("event_type") === tpe)
          .groupBy(col("user_id"))
          .agg(moneySum(col("value")).as(as))
      val universe = ev
        .filter(col("event_type").isin("purchase", "click", "signup"))
        .select(col("user_id")).distinct()
      val joined = Seq(
        roleSum("purchase", "income"), roleSum("click", "outcome"),
        roleSum("signup", "reward"), roleSum("error", "fee"),
        roleSum("view", "fee_reward"))
        .foldLeft(universe)((acc, r) => Joins.anyJoin(acc, r, Seq("user_id"), "left"))
      joined.select(
        col("user_id"),
        greatest(lit(0.0),
          coalesce(col("income"), lit(0.0)) - coalesce(col("outcome"), lit(0.0))
            + coalesce(col("reward"), lit(0.0)) - coalesce(col("fee"), lit(0.0))
            + coalesce(col("fee_reward"), lit(0.0))).as("balance"))
        .orderBy(col("user_id"))
    }),

    // A17+A18 the gas-price-estimation notebook query: quantiles of a
    // value grouped by a computed 1000-wide bucket key
    // (examples/gas_price_estimation/gas_price_estimation.ipynb).
    "q34_gas_stats" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy((floor(col("event_id") / 1000) * 1000).cast("long").as("bucket"))
        .agg(
          percentile(col("value"), lit(0.2)).as("q20"),
          percentile(col("value"), lit(0.5)).as("q50"),
          count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    }),

    // B15 ABI input decode: synthesized transfer() calldata decoded by
    // the Scala ABI codec UDF against a real ABI JSON
    // (reference operations/inputs.py:15-53).
    "q35_abi_decode" -> ((s, dir) => {
      val input = concat(
        lit("0xa9059cbb"),
        lpad(lower(hex(col("o_custkey"))), 64, "0"),
        lpad(lower(hex(col("o_orderkey"))), 64, "0"))
      t(s, dir, "orders")
        .filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"),
          Abi.decode_input(lit(transferAbi), input).as("d"))
        .select(
          col("o_orderkey"),
          col("d.name").as("method"),
          element_at(col("d.params"), 1).getField("value").as("p_to"),
          element_at(col("d.params"), 2).getField("value").as("p_value"))
        .orderBy(col("o_orderkey"))
    }),

    // B7 parent-error propagation over branching trace trees: a row is
    // flagged iff some errored traceAddress is a strict-prefix ancestor
    // and the row itself is not an error node
    // (internal_transactions.py:253-274).
    "q36_parent_error" -> ((s, dir) => {
      Traces.propagateParentErrors(syntheticTraces(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"),
          col("parent_error").cast("int").as("parent_error"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // B6 trace-position id assignment: per-tx row_number in
    // traceAddress depth-first (lexicographic) order → "{tx}.{pos}"
    // (internal_transactions.py:235-251).
    "q37_trace_ids" -> ((s, dir) => {
      Traces.assignIds(syntheticTraces(s, dir))
        .select(col("l_orderkey"), col("l_linenumber"), col("id"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // B16 event → pseudo-input reconstruction:
    // topics[0][0:10] ++ topics[1:] stripped of 0x ++ data[2:]
    // (inputs.py:223-242), over synthesized topic words.
    "q38_event_input" -> ((s, dir) => {
      val word = (c: org.apache.spark.sql.Column) =>
        concat(lit("0x"), lpad(lower(hex(c)), 64, "0"))
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          array(word(col("o_orderkey")), word(col("o_custkey"))).as("topics"),
          concat(lit("0x"),
            lpad(lower(hex(floor(col("o_totalprice")).cast("long"))), 8, "0")).as("data"))
        .select(col("o_orderkey"), Events.reconstructedInput.as("pseudo_input"))
        .orderBy(col("o_orderkey"))
    }),

    // A36 Grafana $timeFilter/$timeSeries macros: hourly series over a
    // parameterized [from, to) range (grafana/dashboards/ethereum.json:520).
    "q39_time_filter" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(Grafana.timeFilter(col("ts"), "2024-01-10", "2024-01-12"))
        .groupBy(Grafana.timeSeries(col("ts"), "hour").as("t"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_v"))
        .orderBy(col("t"))
    }),

    // A33 contracts MV over synthetic creation traces: create-filter,
    // error/parent-error exclusion, coalesce(address,id), selector-
    // containment standard flags (contract_transactions.py:53-112).
    "q42_contracts_mv" -> ((s, dir) => {
      DerivedViews.contracts(syntheticCreationTraces(s, dir))
        .orderBy(col("id"))
    }),

    // A34 token-transfer MV over synthetic Transfer events: topic
    // filter, topic-slice from/to, low-128 uint256 data decode, ANY
    // INNER decimals join (token_holders.py:13-51).
    "q43_token_transfers_mv" -> ((s, dir) => {
      val k = col("o_orderkey")
      // selectivity as a plain pushable predicate on the scan key;
      // mixed-topic filtering is covered by DerivedViewsSpec goldens.
      // (The topic filter folds away via GetArrayItem-over-CreateArray
      // simplification, so the synthesized projection stays inside
      // whole-stage codegen.)
      val events = t(s, dir, "orders")
        .filter(k % 2 === 0)
        .select(
          concat(lit("ev"), k.cast("string")).as("id"),
          concat(lit("0xtoken"), (k % 25).cast("string")).as("address"),
          concat(lit("tx"), k.cast("string")).as("transactionHash"),
          (k / 10).cast("long").as("blockNumber"),
          array(lit(DerivedViews.TransferTopic),
            word64(col("o_custkey")), word64(col("o_custkey") + 1)).as("topics"),
          word64(k).as("data"))
      val descriptions = t(s, dir, "nation").select(
        concat(lit("0xtoken"), col("n_nationkey").cast("string")).as("id"),
        (col("n_nationkey") % 4).cast("short").as("decimals"))
      DerivedViews.tokenTransfers(events, descriptions)
        .orderBy(col("id"))
    }),

    // A35 Bancor-trades view over synthetic Conversion events:
    // converter semi-join, topic slicing, the reference's exact two
    // data slices (low-120-bit amount / low-128-bit return), per-token
    // decimal ANY LEFT joins (bancor_trades.py:13-74).
    "q44_bancor_trades" -> ((s, dir) => {
      val k = col("o_orderkey")
      val events = t(s, dir, "orders")
        .filter(k % 3 === 0) // see q43 note on pushable selectivity
        .select(
          concat(lit("bv"), k.cast("string")).as("id"),
          concat(lit("0xconv"), (k % 50).cast("string")).as("address"),
          concat(lit("tx"), k.cast("string")).as("transactionHash"),
          array(lit(DerivedViews.ConversionTopic),
            word64(k % 25), word64(k % 25 + 1), word64(col("o_custkey"))).as("topics"),
          concat(word64(k), lpad(lower(hex(k + 7)), 64, "0")).as("data"))
      val contracts = t(s, dir, "orders")
        .select((k % 50).as("n")).distinct()
        .select(
          concat(lit("0xconv"), col("n").cast("string")).as("address"),
          when(col("n") < 30, lit(1)).otherwise(lit(0)).cast("short")
            .as("standard_bancor_converter"))
      val descriptions = t(s, dir, "nation").select(
        concat(lit("0x"), lpad(lower(hex(col("n_nationkey"))), 40, "0")).as("id"),
        (col("n_nationkey") % 4).cast("short").as("decimals"))
      DerivedViews.bancorTrades(events, contracts, descriptions)
        .orderBy(col("id"))
    }),

    // B10/B11 price-table shaping: per-address daily close series →
    // trailing moving average with warm-up passthrough + the
    // "{address}_{date}" id convention (token_prices.py:60,79-102).
    // close is integer-valued so the 5-point mean is FP-stable across
    // engines; the floor(x*1e6)/1e6 guard pins the comparison.
    "q46_price_series" -> ((s, dir) => {
      val k = col("o_orderkey")
      val src = t(s, dir, "orders").select(
        concat(lit("0xtok"), (k % 40).cast("string")).as("address"),
        floor(k / 40).cast("long").as("time"),
        floor(col("o_totalprice")).cast("double").as("close"))
      graft.eth.Prices.withMovingAverage(src)
        .select(col("address"), col("time"),
          (floor(col("average") * 1e6) / 1e6).as("btc"),
          graft.eth.Prices.priceId(col("address"),
            timestamp_seconds(col("time") * 86400)).as("id"))
        .orderBy(col("address"), col("time"))
    }),

    // Batch balances.sql archetype (examples/sql_balances/
    // balances.sql:1-63): universe → five joins, first-trace block
    // fees, un-type-filtered fee/outcome, no clamp. All synthesized
    // amounts are integer-valued doubles so sums are FP-exact and
    // order-independent across engines.
    "q47_batch_balances" -> ((s, dir) => {
      Balances.batchBalances(syntheticItx(s, dir))
        .orderBy(col("address"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q47_batch_balances" ->
      """WITH itx AS (
           SELECT 'tx' || CAST(o_orderkey AS VARCHAR) || '.' ||
                    CAST(o_orderkey % 3 AS VARCHAR) AS id,
                  o_orderkey // 10 AS blockNumber,
                  '0xa' || CAST(o_custkey % 100 AS VARCHAR) AS addr_from,
                  '0xa' || CAST((o_custkey + 7) % 100 AS VARCHAR) AS addr_to,
                  CAST(NULL AS VARCHAR) AS author,
                  CAST(floor(o_totalprice) AS DOUBLE) AS value,
                  CAST(o_orderkey % 3 + 1 AS DOUBLE) AS gasPrice,
                  CAST(floor(o_totalprice / 100) AS DOUBLE) AS gasUsed,
                  'call' AS type, CAST(NULL AS VARCHAR) AS rewardType
           FROM orders
           UNION ALL
           SELECT 'b' || CAST(b AS VARCHAR) || '.r', b, NULL, NULL,
                  '0xa' || CAST(b % 100 AS VARCHAR), 5.0, 0.0, 0.0,
                  'reward', 'block'
           FROM (SELECT DISTINCT o_orderkey // 10 AS b FROM orders)),
         universe AS (
           SELECT DISTINCT address FROM (
             SELECT addr_to AS address FROM itx
             UNION ALL SELECT addr_from FROM itx
             UNION ALL SELECT author FROM itx)
           WHERE address IS NOT NULL),
         blockfees AS (
           SELECT blockNumber, sum(gasPrice * gasUsed) AS block_fee
           FROM itx WHERE id LIKE '%.0' GROUP BY 1),
         feereward AS (
           SELECT a.address, sum(f.block_fee) AS fee_reward
           FROM blockfees f
           JOIN (SELECT author AS address, blockNumber FROM itx
                 WHERE type = 'reward' AND rewardType = 'block') a
           USING (blockNumber) GROUP BY 1),
         fromagg AS (
           SELECT addr_from AS address, sum(gasPrice * gasUsed) AS fee,
                  sum(value) AS outcome
           FROM itx GROUP BY 1),
         rewardagg AS (
           SELECT author AS address, sum(value) AS reward
           FROM itx WHERE type = 'reward' GROUP BY 1),
         incomeagg AS (
           SELECT addr_to AS address, sum(value) AS income
           FROM itx WHERE value > 0 AND type != 'reward' GROUP BY 1)
         SELECT u.address,
                coalesce(fr.fee_reward, 0) - coalesce(fa.fee, 0)
                  - coalesce(fa.outcome, 0) + coalesce(r.reward, 0)
                  + coalesce(i.income, 0) AS balance
         FROM universe u
         LEFT JOIN feereward fr ON u.address = fr.address
         LEFT JOIN fromagg fa ON u.address = fa.address
         LEFT JOIN rewardagg r ON u.address = r.address
         LEFT JOIN incomeagg i ON u.address = i.address
         ORDER BY u.address""",
    "q46_price_series" ->
      """SELECT address, time,
                floor(avg_v * 1e6) / 1e6 AS btc,
                address || '_' ||
                  strftime(DATE '1970-01-01' + CAST(time AS INT), '%Y-%m-%d') AS id
         FROM (
           SELECT address, time,
                  CASE WHEN row_number() OVER w >= 5
                       THEN avg(close) OVER (w ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
                       ELSE close END AS avg_v
           FROM (SELECT '0xtok' || CAST(o_orderkey % 40 AS VARCHAR) AS address,
                        o_orderkey // 40 AS time,
                        CAST(floor(o_totalprice) AS DOUBLE) AS close
                 FROM orders)
           WINDOW w AS (PARTITION BY address ORDER BY time))
         ORDER BY address, time""",
    "q30_any_inner_join" ->
      """SELECT o_orderkey, o_totalprice, l_linenumber, l_partkey, l_quantity
         FROM orders JOIN (
           SELECT l_orderkey, l_partkey, l_linenumber, l_quantity FROM (
             SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
                    row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
             FROM lineitem) WHERE rn = 1) li
         ON o_orderkey = li.l_orderkey
         ORDER BY o_orderkey""",
    "q31_array_filter" ->
      """SELECT doc_id, t[2] AS second_tok, len(t) AS n_toks
         FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
         WHERE t[1] = 'the' ORDER BY doc_id""",
    "q32_broadcast_dict" ->
      """SELECT r_name, count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q33_balances_nested" ->
      """SELECT u.user_id,
         greatest(0.0,
           coalesce(i.v, 0.0) - coalesce(c.v, 0.0) + coalesce(s.v, 0.0)
           - coalesce(e.v, 0.0) + coalesce(w.v, 0.0)) AS balance
         FROM (SELECT DISTINCT user_id FROM events
               WHERE event_type IN ('purchase','click','signup')) u
         LEFT JOIN (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                    FROM events WHERE event_type = 'purchase' GROUP BY 1) i ON u.user_id = i.user_id
         LEFT JOIN (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                    FROM events WHERE event_type = 'click' GROUP BY 1) c ON u.user_id = c.user_id
         LEFT JOIN (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                    FROM events WHERE event_type = 'signup' GROUP BY 1) s ON u.user_id = s.user_id
         LEFT JOIN (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                    FROM events WHERE event_type = 'error' GROUP BY 1) e ON u.user_id = e.user_id
         LEFT JOIN (SELECT user_id, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
                    FROM events WHERE event_type = 'view' GROUP BY 1) w ON u.user_id = w.user_id
         ORDER BY u.user_id""",
    "q34_gas_stats" ->
      """SELECT CAST(floor(event_id / 1000) * 1000 AS BIGINT) AS bucket,
         quantile_cont(value, 0.2) AS q20,
         quantile_cont(value, 0.5) AS q50,
         count(*) AS n
         FROM events GROUP BY 1 ORDER BY 1""",
    "q35_abi_decode" ->
      """SELECT o_orderkey, 'transfer' AS method,
         '0x' || lpad(lower(hex(o_custkey)), 40, '0') AS p_to,
         CAST(o_orderkey AS VARCHAR) AS p_value
         FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""",
    "q36_parent_error" ->
      """WITH d AS (
           SELECT l_orderkey, l_linenumber, l_quantity FROM (
             SELECT l_orderkey, l_linenumber, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                 ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
             FROM lineitem) WHERE rn = 1)
         SELECT a.l_orderkey, a.l_linenumber,
         CASE WHEN a.l_quantity < 5 THEN NULL
              WHEN EXISTS (SELECT 1 FROM d b
                           WHERE b.l_orderkey = a.l_orderkey
                             AND b.l_quantity < 5
                             AND b.l_linenumber >= 1
                             AND b.l_linenumber IN (a.l_linenumber // 2, a.l_linenumber // 4))
              THEN 1 END AS parent_error
         FROM d a ORDER BY a.l_orderkey, a.l_linenumber""",
    "q37_trace_ids" ->
      """WITH d AS (
           SELECT l_orderkey, l_linenumber FROM (
             SELECT l_orderkey, l_linenumber,
               row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                 ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
             FROM lineitem) WHERE rn = 1)
         SELECT l_orderkey, l_linenumber,
         CAST(l_orderkey AS VARCHAR) || '.' ||
           CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY path) - 1 AS VARCHAR) AS id
         FROM (SELECT l_orderkey, l_linenumber,
                 CASE l_linenumber
                   WHEN 1 THEN []::INT[] WHEN 2 THEN [0] WHEN 3 THEN [1]
                   WHEN 4 THEN [0,0] WHEN 5 THEN [0,1] WHEN 6 THEN [1,0]
                   WHEN 7 THEN [1,1] END AS path
               FROM d)
         ORDER BY l_orderkey, l_linenumber""",
    "q38_event_input" ->
      """SELECT o_orderkey,
         '0x' || substr(lpad(lower(hex(o_orderkey)), 64, '0'), 1, 8)
              || lpad(lower(hex(o_custkey)), 64, '0')
              || lpad(lower(hex(CAST(floor(o_totalprice) AS BIGINT))), 8, '0') AS pseudo_input
         FROM orders ORDER BY o_orderkey""",
    "q39_time_filter" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS t,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_v
         FROM events
         WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
         GROUP BY 1 ORDER BY 1""",
    // selector blobs / topics below are interpolated from the same
    // Keccak-derived constants the MV flags use
    "q42_contracts_mv" ->
      s"""SELECT
         CASE WHEN o_orderkey % 2 = 0 THEN '0xaddr' || CAST(o_orderkey AS VARCHAR)
              ELSE '0xid' || CAST(o_orderkey AS VARCHAR) END AS id,
         o_orderkey // 10 AS "blockNumber",
         CASE WHEN o_orderkey % 2 = 0 THEN '0xaddr' || CAST(o_orderkey AS VARCHAR) END AS address,
         '0xowner' || CAST(o_custkey AS VARCHAR) AS owner,
         '0x6060' || CASE WHEN o_orderkey % 5 = 0 THEN '$erc20Blob' ELSE '' END
                  || CASE WHEN o_orderkey % 4 = 0 THEN '$erc223Blob' ELSE '' END
                  || CASE WHEN o_orderkey % 6 = 0 THEN '$bancorBlob' ELSE '' END AS bytecode,
         (o_orderkey % 5 = 0)::SMALLINT AS standard_erc20,
         (o_orderkey % 4 = 0)::SMALLINT AS standard_erc223,
         (o_orderkey % 6 = 0)::SMALLINT AS standard_bancor_converter
         FROM orders
         WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 <> 0 AND o_orderkey % 11 <> 0
         ORDER BY id""",
    "q43_token_transfers_mv" ->
      """SELECT
         '0x' || lpad(lower(hex(o_custkey)), 40, '0') AS "from",
         '0x' || lpad(lower(hex(o_custkey + 1)), 40, '0') AS "to",
         o_orderkey / power(10, n_nationkey % 4) AS value,
         'ev' || CAST(o_orderkey AS VARCHAR) AS id,
         '0xtoken' || CAST(o_orderkey % 25 AS VARCHAR) AS token,
         'tx' || CAST(o_orderkey AS VARCHAR) AS "transactionHash",
         o_orderkey // 10 AS "blockNumber"
         FROM orders JOIN nation ON n_nationkey = o_orderkey % 25
         WHERE o_orderkey % 2 = 0
         ORDER BY id""",
    "q44_bancor_trades" ->
      """SELECT
         'bv' || CAST(o_orderkey AS VARCHAR) AS id,
         '0x' || lpad(lower(hex(o_orderkey % 25)), 40, '0') AS from_token,
         '0x' || lpad(lower(hex(o_orderkey % 25 + 1)), 40, '0') AS to_token,
         '0x' || lpad(lower(hex(o_custkey)), 40, '0') AS trader,
         o_orderkey / power(10, (o_orderkey % 25) % 4) AS amount,
         (o_orderkey + 7) / power(10, CASE WHEN o_orderkey % 25 + 1 <= 24
                                           THEN (o_orderkey % 25 + 1) % 4
                                           ELSE 18 END) AS "return",
         'tx' || CAST(o_orderkey AS VARCHAR) AS "transactionHash"
         FROM orders
         WHERE o_orderkey % 3 = 0 AND o_orderkey % 50 < 30
         ORDER BY id"""
  )
}
