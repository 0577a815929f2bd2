package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Relational operator queries over the driver testdata, one per reference
 * operator family (SURVEY.md §2: P/A/W/O/F plus the join surface MERGE
 * implies). Each has an ANSI-SQL oracle for DuckDB in `oracle`.
 *
 * Oracle-parity rules used throughout (values must hash-compare equal):
 *  - money/quantity aggregation goes through DECIMAL(18,2) casts (exact in
 *    both engines; double sums are order-nondeterministic), final cast to
 *    DOUBLE;
 *  - int-ish outputs are cast to long/BIGINT on both sides (DuckDB
 *    sum(int) is HUGEINT, Spark count is long);
 *  - every query is totally ordered with explicit tiebreaks.
 */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private val qty = col("l_quantity").cast("decimal(18,2)")
  private val price = col("l_extendedprice").cast("decimal(18,2)")
  private val disc = col("l_discount").cast("decimal(18,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3/A5 + F5: grouped aggregation with decimal-exact sums (TPC-H Q1 shape;
    // reference analog: groupBy counts in check_table.py:23-25)
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(qty).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double")
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // P3/P6: selective filter + scalar aggregate (TPC-H Q6 shape; the
    // reference's year-equality scan, silver/*.py:26)
    "q02_selective_filter" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          disc.between(lit(0.03).cast("decimal(18,2)"), lit(0.07).cast("decimal(18,2)")) &&
          col("l_quantity") < 24)
        .agg(sum(price * disc).cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // equi-join + aggregation: the MERGE join surface (SURVEY.md §2.3)
    "q03_join_agg" -> ((s, dir) => {
      t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_total"))
        .orderBy("c_mktsegment")
    }),

    // 3-way join with an explicitly broadcast dimension (small dim →
    // broadcast per SURVEY.md §2.3 join table)
    "q04_join_3way" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = broadcast(t(s, dir, "customer"))
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp"))
        .groupBy("c_mktsegment")
        .agg(sum(price * (lit(1).cast("decimal(18,2)") - disc)).cast("double")
          .as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("c_mktsegment")
    }),

    // left-semi join (EXISTS)
    "q05_semi_join" -> ((s, dir) => {
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem").filter(col("l_quantity") > 49)
          .select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    // left-anti join (NOT EXISTS): customers with no big order
    "q06_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000.0)
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_lost"))
        .orderBy("c_mktsegment")
    }),

    // W2: most-frequent-value-per-key dedup with a total-order tiebreak —
    // the reference's row_number top-1 pattern (silver/drivers.py:57-66)
    // made deterministic (SURVEY.md §2.5)
    "q07_top1_per_group" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val freq = t(s, dir, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("freq"))
      val w = Window.partitionBy("user_id")
        .orderBy(desc("freq"), asc("event_type"))
      freq.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("event_type").agg(count(lit(1)).as("n_users"))
        .orderBy("event_type")
    }),

    // A4/W1: unbounded-frame analytic count (silver/teams.py:52-53)
    "q08_window_freq" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      t(s, dir, "events")
        .withColumn("type_freq",
          count(lit(1)).over(Window.partitionBy(col("event_type"))))
        .select("event_type", "type_freq").distinct()
        .orderBy("event_type")
    }),

    // ranking window: top-3 per group with deterministic tiebreak
    "q09_rank_topk" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3 && col("o_custkey") < 100)
        .select(col("o_custkey"), col("o_orderkey"), col("rnk").cast("long").as("rnk"))
        .orderBy("o_custkey", "rnk")
    }),

    // O1/O3: global top-k with total order (dq_failed.py:21-23)
    "q10_sort_limit" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
        .limit(10)
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
          col("l_extendedprice"))
    }),

    // A2: distinct (silver/circuits.py:49)
    "q11_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // A1: latest-generation resolution — filter to max(col), the reference's
    // snapshot-read idiom (utils.py:58-71)
    "q12_latest_generation" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      // Spark 4 reads parquet timestamp[us] as TIMESTAMP_NTZ → LocalDateTime
      val maxDate = o.agg(max(col("o_orderdate"))).head().get(0)
      o.filter(col("o_orderdate") === lit(maxDate))
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("first_key"))
    }),

    // §2.7: union of two labeled projections
    "q13_union" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), lit("urgent").as("label"))
      val b = o.filter(col("o_totalprice") > 400000.0)
        .select(col("o_orderkey"), lit("big").as("label"))
      a.unionByName(b).groupBy("label").agg(count(lit(1)).as("n"))
        .orderBy("label")
    }),

    // F8: when/otherwise conditional aggregation (utils.py:81)
    "q14_conditional_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("l_linestatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("l_linestatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("n_heavy"))
        .orderBy("l_returnflag")
    }),

    // F1/F2/F7/F13: surrogate-key hashing (md5 for oracle parity; the engine
    // itself uses xxhash64 like silver/laps.py:38-46), concat_ws, upper,
    // coalesce, substring
    "q15_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          md5(concat_ws("||", col("p_brand"), col("p_type"))).as("surrogate"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_type"), 1, 5).as("type5"),
          coalesce(col("p_name"), lit("unknown")).as("name_nn"),
          (length(col("p_name"))).cast("long").as("name_len"))
        .orderBy("p_partkey").limit(50)
    }),

    // F10-adjacent: datetime extraction in UTC
    "q16_datetime" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n"))
        .orderBy("yr", "mo")
    }),

    // F3: late-bound JSON path extraction (bronze_ingestion_by_key.py:41-46)
    "q17_json_extract" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"),
          max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // F4: full typed JSON parse raw→struct — the reference's silver-parse
    // idiom from_json(raw, schema) (silver/sessions.py:31)
    "q19_from_json" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("j", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy("event_type")
        .agg(sum(col("j.k").cast("long")).as("sum_k"),
          count(when(col("j.k").isNotNull, 1)).as("n_parsed"))
        .orderBy("event_type")
    }),

    // F10: unix_timestamp epoch math (utils.py:88-93 apply_gmt_offset)
    "q20_epoch" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("epoch_s", unix_timestamp(col("ts").cast("timestamp")))
        .groupBy("event_type")
        .agg(min(col("epoch_s")).as("min_epoch"),
          max(col("epoch_s")).as("max_epoch"),
          count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // P6: SQL-string predicate through Dataset.where (the reference filters
    // with raw SQL strings, dq_runner.py:19, show_table.py:13-15)
    "q21_where_string" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .where("l_returnflag = 'R' AND l_quantity > 45")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
    }),

    // F9: signed "±H:MM:SS" offset parse via split + arithmetic (the
    // reference's gmt_offset_to_seconds, utils.py:74-85) — offsets are
    // synthesized deterministically from supplier keys, then parsed back
    "q22_gmt_offset" -> ((s, dir) => {
      val off = concat(
        when(pmod(col("s_suppkey"), lit(2)) === 0, "-").otherwise(""),
        pmod(col("s_suppkey"), lit(13)).cast("string"), lit(":30:00"))
      val parts = split(regexp_replace(col("off"), "^-", ""), ":")
      val secs = (element_at(parts, 1).cast("long") * 3600 +
        element_at(parts, 2).cast("long") * 60 +
        element_at(parts, 3).cast("long")) *
        when(col("off").startsWith("-"), -1L).otherwise(1L)
      t(s, dir, "supplier")
        .withColumn("off", off)
        .withColumn("off_s", secs)
        .groupBy("off")
        .agg(count(lit(1)).as("n"), min(col("off_s")).as("offset_seconds"))
        .orderBy("off")
    }),

    // F12: higher-order array functions (utils.py:100-103 transform pattern)
    "q18_array_hof" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("ws", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("ws")).cast("long").as("n_words"),
          array_max(transform(col("ws"), w => length(w))).cast("long")
            .as("longest_word"),
          size(array_distinct(col("ws"))).cast("long").as("n_distinct"))
        .orderBy("doc_id")
    }))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_selective_filter" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST(0.03 AS DECIMAL(18,2)) AND CAST(0.07 AS DECIMAL(18,2))
        |  AND l_quantity < 24""".stripMargin,
    "q03_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q04_join_3way" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate >= TIMESTAMP '1995-06-01'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q05_semi_join" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q06_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_lost FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q07_top1_per_group" ->
      """WITH freq AS (
        |  SELECT user_id, event_type, count(*) AS freq
        |  FROM events GROUP BY user_id, event_type),
        |top1 AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY freq DESC, event_type ASC) AS rn
        |  FROM freq)
        |SELECT event_type, count(*) AS n_users FROM top1 WHERE rn = 1
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q08_window_freq" ->
      """SELECT DISTINCT event_type,
        |  count(*) OVER (PARTITION BY event_type) AS type_freq
        |FROM events ORDER BY event_type""".stripMargin,
    "q09_rank_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rnk AS BIGINT) AS rnk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
        |  FROM orders) WHERE rnk <= 3 AND o_custkey < 100
        |ORDER BY o_custkey, rnk""".stripMargin,
    "q10_sort_limit" ->
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 10""".stripMargin,
    "q11_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_latest_generation" ->
      """SELECT count(*) AS n, min(o_orderkey) AS first_key FROM orders
        |WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)""".stripMargin,
    "q13_union" ->
      """SELECT label, count(*) AS n FROM (
        |  SELECT o_orderkey, 'urgent' AS label FROM orders
        |  WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT o_orderkey, 'big' AS label FROM orders
        |  WHERE o_totalprice > 400000.0)
        |GROUP BY label ORDER BY label""".stripMargin,
    "q14_conditional_agg" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_heavy
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q15_scalar_funcs" ->
      """SELECT p_partkey,
        |  md5(concat_ws('||', p_brand, p_type)) AS surrogate,
        |  upper(p_brand) AS brand_u,
        |  substring(p_type, 1, 5) AS type5,
        |  coalesce(p_name, 'unknown') AS name_nn,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin,
    "q16_datetime" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo, count(*) AS n
        |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin,
    "q17_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q19_from_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 END) AS n_parsed
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q20_epoch" ->
      """SELECT event_type,
        |  min(CAST(floor(epoch(ts)) AS BIGINT)) AS min_epoch,
        |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS max_epoch,
        |  count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q18_array_hof" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |  CAST(list_aggregate(list_transform(string_split(text, ' '), w -> length(w)), 'max') AS BIGINT) AS longest_word,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_where_string" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45""".stripMargin,
    "q22_gmt_offset" ->
      """WITH o AS (
        |  SELECT (CASE WHEN s_suppkey % 2 = 0 THEN '-' ELSE '' END ||
        |    CAST(s_suppkey % 13 AS VARCHAR) || ':30:00') AS off
        |  FROM supplier),
        |p AS (SELECT off, string_split(replace(off, '-', ''), ':') AS parts FROM o)
        |SELECT off, count(*) AS n,
        |  CAST(min((CAST(parts[1] AS BIGINT) * 3600 + CAST(parts[2] AS BIGINT) * 60 +
        |    CAST(parts[3] AS BIGINT)) *
        |    (CASE WHEN off LIKE '-%' THEN -1 ELSE 1 END)) AS BIGINT) AS offset_seconds
        |FROM p GROUP BY off ORDER BY off""".stripMargin)
}
