package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** The query surface the reference delegates to Hive (SURVEY.md §2.D),
  * native here: scans, joins (broadcast/sort-merge/semi), aggregation,
  * rollup, windows, top-k, set ops — all Catalyst built-ins over the
  * TPC-H-ish star schema.
  *
  * Float determinism: every SUM over a double column goes through
  * DECIMAL(18,2) (exact integer arithmetic, order-independent) and is
  * cast back to double at the end, so Spark's unordered partial
  * aggregation and DuckDB's sequential sum produce bit-identical
  * results. Raw column passthrough (no arithmetic) is exact by
  * construction.
  */
object RelationalQueries {

  private def dec(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** Derived `partsupp` stand-in: the synthetic schema has no partsupp
    * table, so the part-supplier relationship materializes from
    * lineitem — ps_supplycost is the cheapest observed line price
    * (DECIMAL(18,2), exact — a unit-price division would be inexact)
    * and ps_availqty the total quantity ever shipped by that pair. The
    * SAME derivation runs in both engines ([[psSql]]), so the TPC-H
    * Q2/Q9/Q11/Q16/Q20 shapes built on it stay hash-exact. One
    * map-side-combined aggregate over the fact scan; at 100 TB this is
    * the one full pass those queries share (a real deployment would
    * materialize it once). */
  private def partsupp(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .agg(min(dec(col("l_extendedprice"))).as("ps_supplycost"),
        sum(col("l_quantity")).cast("long").as("ps_availqty"))

  /** DuckDB mirror of [[partsupp]] — the `ps` CTE every derived-
    * partsupp oracle chains from. */
  private val psSql =
    """ps AS (SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS ps_supplycost,
      |    CAST(sum(l_quantity) AS BIGINT) AS ps_availqty
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  val specs: Seq[QuerySpec] = Seq(

    // Projection + filter with predicate pushdown to the parquet scan.
    QuerySpec("proj_filter_lineitem",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") > to_timestamp(lit("1998-09-02 00:00:00")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
             |FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-09-02 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      bench = true),

    // Broadcast join fact→dim + aggregation per segment.
    QuerySpec("join_orders_customer",
      (s, d) => Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),
      bench = true),

    // Left-semi join: lineitems whose part is oversized.
    QuerySpec("join_semi_part",
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_size") > 40),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .select(col("l_partkey")).distinct()
        .orderBy(col("l_partkey")),
      Some("""SELECT DISTINCT l_partkey FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 40)
             |ORDER BY l_partkey""".stripMargin),
      bench = true),

    // Left-anti join: parts with no shipment in the dataset's final
    // months (every part has SOME lineitem, so the unfiltered anti
    // would be empty — the date cut keeps the result non-degenerate).
    QuerySpec("join_anti_part",
      (s, d) => Tables.part(s, d)
        .join(Tables.lineitem(s, d)
            .filter(col("l_shipdate") > to_timestamp(lit("2001-06-01 00:00:00"))),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, p_brand FROM part
             |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem
             |  WHERE l_shipdate > TIMESTAMP '2001-06-01 00:00:00')
             |ORDER BY p_partkey""".stripMargin)),

    // TPC-H Q1 shape: the flagship aggregation (also SparkEntry.entry).
    QuerySpec("agg_returnflag",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02 00:00:00")))
        val discPrice = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        val charge = discPrice * (lit(1.0) + col("l_tax"))
        // disc_price is an exact 4-decimal rational (2dp × 2dp) and
        // charge an exact 6-decimal one; casting at that precision keeps
        // the double off decimal midpoints, so Spark's HALF_UP and
        // DuckDB's conversion agree bit-for-bit. DECIMAL(18,2) here
        // WOULD hit true midpoints and diverge.
        li.groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
            sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
            sum(discPrice.cast(DecimalType(18, 4))).cast("double").as("sum_disc_price"),
            sum(charge.cast(DecimalType(18, 6))).cast("double").as("sum_charge"),
            (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  CAST(sum(CAST((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      bench = true),

    // Exact distinct aggregation (HLL approx variant is bench-only —
    // approx_count_distinct has no DuckDB-identical oracle).
    QuerySpec("agg_distinct_users",
      (s, d) => Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_users,
             |  count(*) AS n_events
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      bench = true),

    // HLL sketch variant of the distinct count — the 100 TB path (no
    // exact-distinct shuffle). The raw estimate is engine-specific
    // (Spark HLL++ vs DuckDB's sketch would never hash-match), so the
    // checkable output is the ACCURACY CONTRACT: approx_ok = the
    // estimate landed within 3×rsd (rsd = 0.02) of the exact count.
    // The oracle asserts TRUE per group — a red row means Spark's
    // sketch broke its own error bound. The exact countDistinct rides
    // along ONLY to self-certify (one mixed-distinct aggregate pass,
    // Expand-based — so THIS registry query, and its bench line, price
    // in the certification); the production scale path is the
    // estimate alone, where exact distinct is the shuffle being
    // avoided (that raw path is bounded by ApproxBoundSpec).
    QuerySpec("agg_approx_users",
      (s, d) => Tables.events(s, d).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), 0.02).as("apx"),
          countDistinct(col("user_id")).as("exact"))
        .select(col("event_type"),
          (abs(col("apx") - col("exact")).cast("double") <=
            lit(0.06) * col("exact").cast("double")).as("approx_ok"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type, CAST(1 AS BOOLEAN) AS approx_ok
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
      bench = true),

    // Grouping sets: rollup region → nation over the customer dims.
    QuerySpec("agg_rollup_nation",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name")),
      Some("""SELECT r_name, n_name, count(*) AS n_cust,
             |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY ROLLUP(r_name, n_name)
             |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin)),

    // Grouping sets: full cube over (returnflag, linestatus).
    QuerySpec("agg_cube_flags",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)),

    // Window ranking: top-3 orders per customer.
    QuerySpec("window_top_orders",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, d).withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
          .orderBy(col("o_custkey"), col("rnk"))
      },
      Some("""WITH r AS (SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
             |  FROM orders)
             |SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM r
             |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin),
      bench = true),

    // Top-k: TakeOrderedAndProject (no global sort of the full table).
    QuerySpec("topk_suppliers",
      (s, d) => Tables.supplier(s, d)
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
        .limit(5)
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal")),
      Some("""SELECT s_suppkey, s_name, s_acctbal FROM supplier
             |ORDER BY s_acctbal DESC, s_suppkey ASC LIMIT 5""".stripMargin)),

    // Set ops over (user, day) grain: active-without-error days.
    // (Plain user_id grain is degenerate — every user hits every
    // event type — so the day dimension keeps the result non-empty.)
    QuerySpec("setop_union_events",
      (s, d) => {
        val e = Tables.events(s, d)
        def ud(t: String) = e.filter(col("event_type") === t)
          .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        ud("click").union(ud("purchase")).distinct()
          .except(ud("error"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""(SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
             |   WHERE event_type = 'click'
             | UNION
             | SELECT user_id, strftime(ts, '%Y-%m-%d') FROM events
             |   WHERE event_type = 'purchase')
             |EXCEPT
             |SELECT user_id, strftime(ts, '%Y-%m-%d') FROM events
             |WHERE event_type = 'error'
             |ORDER BY user_id, day""".stripMargin)),

    // Set ops, part 2 — INTERSECT (plans as a left-semi aggregate, the
    // same hash shapes as the joins above): user-days that both
    // clicked AND purchased.
    QuerySpec("setop_intersect_events",
      (s, d) => {
        val e = Tables.events(s, d)
        def ud(t: String) = e.filter(col("event_type") === t)
          .select(col("user_id"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        ud("click").intersect(ud("purchase"))
          .orderBy(col("user_id"), col("day"))
      },
      Some("""SELECT user_id, strftime(ts, '%Y-%m-%d') AS day FROM events
             |WHERE event_type = 'click'
             |INTERSECT
             |SELECT user_id, strftime(ts, '%Y-%m-%d') FROM events
             |WHERE event_type = 'purchase'
             |ORDER BY user_id, day""".stripMargin)),

    // Unpivot (wide→long): lineitem money columns melted to
    // (metric, value) rows and re-aggregated — the reshape every
    // metrics pipeline needs, via the native unpivot operator (a
    // generated projection, not a join). DECIMAL-exact sums.
    QuerySpec("unpivot_lineitem_metrics",
      (s, d) => Tables.lineitem(s, d)
        .select(dec(col("l_quantity")).as("quantity"),
          dec(col("l_extendedprice")).as("extendedprice"),
          dec(col("l_discount")).as("discount"),
          dec(col("l_tax")).as("tax"))
        .unpivot(Array.empty, "metric", "value")
        .groupBy(col("metric"))
        .agg(sum(col("value")).cast("double").as("total"),
          count(lit(1)).as("n"))
        .orderBy(col("metric")),
      Some("""SELECT metric, CAST(sum(v) AS DOUBLE) AS total, count(*) AS n
             |FROM (
             |  SELECT 'quantity' AS metric, CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
             |  UNION ALL SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
             |  UNION ALL SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
             |  UNION ALL SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Sessionization: gap > 30 min starts a new session; assignment is
    // a running sum of session starts — ONE shuffle on user_id + a
    // sort, no iteration. Ties on ts are broken by event_id so the lag
    // is deterministic.
    QuerySpec("sessionize_events",
      (s, d) => {
        val e = Tables.events(s, d)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapMs = unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(w))
        val isNew = when(lag(col("ts"), 1).over(w).isNull || gapMs > 1800000L, 1L)
          .otherwise(0L)
        e.select(col("user_id"), col("event_id"), col("ts"), isNew.as("is_new"))
          .withColumn("session_idx", sum(col("is_new")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("session_idx"))
          .agg(count(lit(1)).as("n_events"),
            unix_millis(min(col("ts"))).as("start_ms"),
            unix_millis(max(col("ts"))).as("end_ms"))
          .orderBy(col("user_id"), col("session_idx"))
      },
      Some("""WITH g AS (SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |      OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000 THEN 1 ELSE 0 END AS is_new
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |s AS (SELECT user_id, event_id, ts,
             |    (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS UNBOUNDED PRECEDING))::BIGINT AS session_idx FROM g)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |  min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms
             |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      bench = true),

    // As-of join (point-in-time): each event picks the most recent
    // signup of its user at or before its timestamp. Spark has no ASOF
    // operator; composed scalably as union + last-non-null over a
    // (ts, kind) ordered window — one shuffle on user_id, no
    // per-row range probe. Signups are deduped to one per (user, ts)
    // so the greatest-ts-at-or-before row is unique (determinism).
    QuerySpec("asof_last_signup",
      (s, d) => {
        val e = Tables.events(s, d)
        val signups = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts")).agg(min(col("event_id")).as("signup_id"))
        val l = signups.select(col("user_id"), col("ts"), lit(0).as("kind"),
          col("signup_id"), lit(null).cast("long").as("event_id"))
        val ev = e.select(col("user_id"), col("ts"), lit(1).as("kind"),
          lit(null).cast("long").as("signup_id"), col("event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("kind").asc, col("event_id").asc_nulls_first)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        l.union(ev)
          .withColumn("last_signup_id",
            last(col("signup_id"), ignoreNulls = true).over(w))
          .withColumn("last_signup_ts",
            last(when(col("signup_id").isNotNull, col("ts")), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("ts_ms"),
            col("last_signup_id").as("signup_id"),
            unix_millis(col("last_signup_ts")).as("signup_ts_ms"))
          .orderBy(col("event_id"))
      },
      Some("""WITH signups AS (SELECT user_id, ts, min(event_id) AS signup_id
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2)
             |SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms,
             |  l.signup_id, epoch_ms(l.ts) AS signup_ts_ms
             |FROM events e ASOF LEFT JOIN signups l
             |  ON e.user_id = l.user_id AND e.ts >= l.ts
             |ORDER BY e.event_id""".stripMargin),
      bench = true),

    // Range (interval) join: events per one-hour-after-signup window,
    // via the bucketized equi-join rewrite (ScaleJoins.bucketedRangeJoin)
    // — a raw BETWEEN join would plan as a broadcast-nested-loop. The
    // oracle states the same semantics as a plain non-equi join.
    QuerySpec("range_join_signup_hour",
      (s, d) => {
        val e = Tables.events(s, d)
        val points = e.select(col("user_id").as("key"),
          unix_millis(col("ts")).as("ts_ms"), col("event_id"))
        val iv = e.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts")).agg(min(col("event_id")).as("signup_id"))
          .select(col("user_id").as("key"), col("signup_id"),
            unix_millis(col("ts")).as("start_ms"),
            (unix_millis(col("ts")) + 3600000L).as("end_ms"))
        graft.operators.ScaleJoins.bucketedRangeJoin(points, iv, 3600000L)
          .groupBy(col("signup_id")).agg(count(lit(1)).as("n_events"))
          .orderBy(col("signup_id"))
      },
      Some("""WITH signups AS (SELECT user_id, ts, min(event_id) AS signup_id
             |  FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
             |iv AS (SELECT user_id, signup_id, epoch_ms(ts) AS s_ms,
             |    epoch_ms(ts) + 3600000 AS e_ms FROM signups)
             |SELECT signup_id, count(*) AS n_events
             |FROM events e JOIN iv ON e.user_id = iv.user_id
             |  AND epoch_ms(e.ts) BETWEEN s_ms AND e_ms
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // Pivot — the reshape inverse of unpivot_lineitem_metrics, via the
    // native pivot operator with the value set pinned (no extra
    // distinct-scan job to discover columns; at scale the column set
    // must be declared, not inferred). DECIMAL-exact sums as always.
    QuerySpec("pivot_flag_status",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(dec(col("l_quantity"))).cast("double"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(sum(CASE WHEN l_linestatus = 'F'
             |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "F",
             |  CAST(sum(CASE WHEN l_linestatus = 'O'
             |    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS "O"
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Exact median without an approx sketch: rank per group, keep the
    // middle one or two rows, average them through DECIMAL (sum of ≤2
    // exact decimals, then one division by 1 or 2 — both IEEE-exact,
    // so the hash matches DuckDB bit-for-bit, which quantile_cont's
    // engine-specific interpolation would not). The window partitions
    // by customer — groups are small and numerous, so the per-group
    // sort is scale-safe (contrast a global or few-group median, which
    // would want an approx sketch instead).
    QuerySpec("median_order_by_cust",
      (s, d) => {
        val ranked = Tables.orders(s, d)
          .select(col("o_custkey"), dec(col("o_totalprice")).as("p"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("o_custkey")).orderBy(col("p"))))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_custkey"))))
        ranked.filter(col("rn") === expr("(n + 1) div 2") ||
            col("rn") === expr("(n + 2) div 2"))
          .groupBy(col("o_custkey"))
          .agg((sum(col("p")).cast("double") / count(lit(1))).as("median_price"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH r AS (SELECT o_custkey,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(o_totalprice AS DECIMAL(18,2))) AS rn,
             |    count(*) OVER (PARTITION BY o_custkey) AS n
             |  FROM orders),
             |m AS (SELECT * FROM r WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2)
             |SELECT o_custkey, CAST(sum(p) AS DOUBLE) / count(*) AS median_price
             |FROM m GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Ordered funnel conversion (view → click → purchase): the classic
    // product-analytics query — per user, each stage's earliest
    // occurrence must FOLLOW the previous stage's. Sequential mins
    // compose as three user-keyed aggregates chained by equi-joins
    // (map-side combined, never a per-user event sort); timestamps
    // compare as epoch millis so both engines order identically.
    QuerySpec("funnel_conversion",
      (s, d) => {
        val ev = TrackedCache.persist(Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms")))
        val t1 = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ms")).as("t1"))
        val t2 = ev.filter(col("event_type") === "click")
          .join(t1, Seq("user_id"))
          .filter(col("ms") > col("t1"))
          .groupBy(col("user_id")).agg(min(col("ms")).as("t2"))
        val t3 = ev.filter(col("event_type") === "purchase")
          .join(t2, Seq("user_id"))
          .filter(col("ms") > col("t2"))
          .groupBy(col("user_id")).agg(min(col("ms")).as("t3"))
        t1.agg(count(lit(1)).as("n_users")).select(
            lit("1_view").as("stage"), col("n_users"))
          .unionByName(t2.agg(count(lit(1)).as("n_users")).select(
            lit("2_view_click").as("stage"), col("n_users")))
          .unionByName(t3.agg(count(lit(1)).as("n_users")).select(
            lit("3_view_click_purchase").as("stage"), col("n_users")))
          .orderBy(col("stage"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
             |  FROM events),
             |t1 AS (SELECT user_id, min(ms) AS t1 FROM ev
             |  WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(ms) AS t2 FROM ev e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE event_type = 'click' AND ms > t1 GROUP BY 1),
             |t3 AS (SELECT e.user_id, min(ms) AS t3 FROM ev e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE event_type = 'purchase' AND ms > t2 GROUP BY 1)
             |SELECT stage, n_users FROM (
             |  SELECT '1_view' AS stage, count(*)::BIGINT AS n_users FROM t1
             |  UNION ALL
             |  SELECT '2_view_click', count(*)::BIGINT FROM t2
             |  UNION ALL
             |  SELECT '3_view_click_purchase', count(*)::BIGINT FROM t3)
             |ORDER BY stage""".stripMargin)),

    // Retention cohorts: users by signup day × activity-day offset —
    // the engagement triangle every events warehouse reports. Days are
    // integer epoch-days (no calendar/timezone rendering to diverge
    // on); shape is two user-keyed aggregates and one user-keyed
    // equi-join, with the final (cohort, offset) aggregate
    // metadata-scale.
    QuerySpec("retention_cohorts",
      (s, d) => {
        val ev = TrackedCache.persist(Tables.events(s, d)
          .select(col("user_id"), col("event_type"),
            expr("unix_millis(ts) div 86400000").as("day")))
        val cohort = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
        val active = ev.select(col("user_id"), col("day")).distinct()
        cohort.join(active, Seq("user_id"))
          .select(col("cohort_day"),
            (col("day") - col("cohort_day")).as("day_offset"))
          .filter(col("day_offset").between(0L, 7L))
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |    epoch_ms(ts) // 86400000 AS day FROM events),
             |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev
             |  WHERE event_type = 'signup' GROUP BY 1),
             |active AS (SELECT DISTINCT user_id, day FROM ev)
             |SELECT cohort_day, day - cohort_day AS day_offset,
             |  count(*)::BIGINT AS n_users
             |FROM cohort JOIN active USING (user_id)
             |WHERE day - cohort_day BETWEEN 0 AND 7
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // TPC-H Q3 shape — the classic 3-way star join + top-k: unshipped
    // high-revenue orders for one market segment. The segment filter
    // reduces customer to a key set consumed as a SEMI join; revenue
    // goes through the exact-rational DECIMAL(18,4) discipline
    // (2dp × 2dp product); the top-10 plans as TakeOrdered, never a
    // global sort.
    QuerySpec("q3_shipping_priority",
      (s, d) => {
        val cutoff = to_timestamp(lit("1998-03-15 00:00:00"))
        val cust = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("o_custkey"))
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") < cutoff)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") > cutoff)
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        // customer is fact-scale at 100 TB (no broadcast hint — AQE
        // may still elect one at small SFs); the semi shape keeps the
        // segment filter from widening the join output
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, Seq("o_custkey"), "left_semi")
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin),
      bench = true),

    // TPC-H Q5 shape — the 6-way snowflake join: revenue by nation for
    // one region and one order year, with the local-supplier condition
    // (customer and supplier in the SAME nation) expressed as an
    // equi-join key, not a filter after a wider join. Dimension chain
    // region→nation broadcasts; fact-side joins stay keyed.
    QuerySpec("q5_local_supplier_revenue",
      (s, d) => {
        val asiaNations = Tables.nation(s, d)
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "ASIA")), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"), col("n_name"))
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"))
        val supp = Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        // customer is fact-scale (keyed join, AQE decides); supplier
        // and the nation⨝region chain are dimension-scale broadcasts
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(supp),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |    AND c_nationkey = s_nationkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin),
      bench = true),

    // RFM segmentation: the standard customer-value grid over the
    // purchase stream — recency (days since last purchase, vs the
    // corpus's latest day), frequency, monetary — bucketed by FIXED
    // thresholds (a global-quantile ntile would window the full user
    // set; fixed grids are what production scorecards pin anyway so
    // segments stay comparable across runs). Monetary is exact:
    // floor(value·100) cents per row (IEEE-identical in both
    // engines), then integer sums. One user-keyed aggregate + a
    // broadcast 1-row max-day; the segment rollup is grid-scale.
    QuerySpec("rfm_segments",
      (s, d) => {
        val purch = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"),
            floor(col("value") * 100).cast("long").as("cents"))
        val maxDay = broadcast(purch.agg(max(col("day")).as("max_day")))
        val perUser = purch.groupBy(col("user_id"))
          .agg(max(col("day")).as("last_day"),
            count(lit(1)).as("f"), sum(col("cents")).as("m"))
          .crossJoin(maxDay)
          .select((col("max_day") - col("last_day")).as("recency"),
            col("f"), col("m"))
        val rb = when(col("recency") <= 7, 1).when(col("recency") <= 30, 2)
          .when(col("recency") <= 90, 3).otherwise(4)
        val fb = when(col("f") <= 1, 1).when(col("f") <= 3, 2)
          .when(col("f") <= 10, 3).otherwise(4)
        val mb = when(col("m") < 1000L, 1).when(col("m") < 10000L, 2)
          .when(col("m") < 100000L, 3).otherwise(4)
        perUser.select(rb.as("r_bucket"), fb.as("f_bucket"), mb.as("m_bucket"))
          .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      },
      Some("""WITH p AS (SELECT user_id, epoch_ms(ts) // 86400000 AS day,
             |    CAST(floor(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |mx AS (SELECT max(day) AS max_day FROM p),
             |u AS (SELECT max_day - max(day) AS recency,
             |    count(*)::BIGINT AS f, sum(cents)::BIGINT AS m
             |  FROM p CROSS JOIN mx GROUP BY user_id, max_day),
             |b AS (SELECT
             |    CASE WHEN recency <= 7 THEN 1 WHEN recency <= 30 THEN 2
             |      WHEN recency <= 90 THEN 3 ELSE 4 END AS r_bucket,
             |    CASE WHEN f <= 1 THEN 1 WHEN f <= 3 THEN 2
             |      WHEN f <= 10 THEN 3 ELSE 4 END AS f_bucket,
             |    CASE WHEN m < 1000 THEN 1 WHEN m < 10000 THEN 2
             |      WHEN m < 100000 THEN 3 ELSE 4 END AS m_bucket
             |  FROM u)
             |SELECT r_bucket, f_bucket, m_bucket, count(*)::BIGINT AS n_users
             |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q18 shape — the "large-volume customer" pattern: aggregate
    // the fact table, HAVING-filter the groups, then join the
    // surviving keys back to the dimensions. The having-filter runs on
    // the (orderkey) aggregate BEFORE any dimension join touches it,
    // so the join input is the filtered group list, not the fact
    // table; quantities go through exact DECIMAL sums; top-20 is a
    // TakeOrdered.
    QuerySpec("q18_large_orders",
      (s, d) => {
        val big = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sum(dec(col("l_quantity"))).as("total_qty"))
          .filter(col("total_qty") > 300)
        big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
            col("total_qty").cast("double").as("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
          .limit(20)
      },
      Some("""WITH big AS (SELECT l_orderkey,
             |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
             |SELECT o_orderkey, o_custkey, o_orderdate,
             |  CAST(total_qty AS DOUBLE) AS total_qty
             |FROM big JOIN orders ON l_orderkey = o_orderkey
             |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin),
      bench = true),

    // Correlated-aggregate shape: customers spending above 2× the
    // per-customer average, decided by CROSS-MULTIPLICATION
    // (spend·n_cust > 2·total) so no division ever runs — the exact
    // integer-rational gate discipline on a relational HAVING-vs-
    // global-scalar query. Money is floor-cents int64 per row
    // (IEEE-identical), widened through DECIMAL(38,0)/HUGEINT for the
    // products; the global scalar is a broadcast 1-row aggregate, not
    // a window.
    QuerySpec("above_avg_spend_customers",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .select(col("o_custkey"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("cents")).as("spend_cents"),
            count(lit(1)).as("n_orders"))
        val tot = broadcast(spend.agg(
          sum(col("spend_cents")).as("total_cents"),
          count(lit(1)).as("n_cust")))
        spend.crossJoin(tot)
          .filter(expr("CAST(spend_cents AS DECIMAL(38,0)) * n_cust > " +
            "CAST(2 AS DECIMAL(38,0)) * total_cents"))
          .select(col("o_custkey").as("custkey"), col("spend_cents"),
            col("n_orders"))
          .orderBy(col("spend_cents").desc, col("custkey"))
      },
      Some("""WITH sp AS (SELECT o_custkey,
             |    sum(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT
             |      AS spend_cents,
             |    count(*)::BIGINT AS n_orders
             |  FROM orders GROUP BY o_custkey),
             |t AS (SELECT sum(spend_cents)::BIGINT AS total_cents,
             |    count(*)::BIGINT AS n_cust FROM sp)
             |SELECT o_custkey AS custkey, spend_cents, n_orders
             |FROM sp CROSS JOIN t
             |WHERE spend_cents::HUGEINT * n_cust > 2::HUGEINT * total_cents
             |ORDER BY spend_cents DESC, custkey""".stripMargin)),

    // TPC-H Q6 shape — the forecast-revenue scan: every predicate
    // sits directly on lineitem columns, so the whole query is one
    // parquet scan with ALL THREE filters pushed (the pin below
    // checks PushedFilters) and a single-row DECIMAL(18,4) sum — at
    // 100 TB this is the query where pushdown IS the plan.
    QuerySpec("q6_forecast_revenue",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(18, 4))).cast("double").as("revenue")),
      Some("""SELECT CAST(sum(CAST(l_extendedprice * l_discount
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin),
      bench = true),

    // TPC-H Q10 shape — the returned-item customer report: which
    // customers returned the most revenue in a quarter. Fact side
    // filters (return flag + order quarter) run scan-side; the
    // customer/nation dimension chain joins AFTER the per-customer
    // revenue aggregate, so dimension columns never ride the fact
    // shuffle; top-20 is a TakeOrdered.
    QuerySpec("q10_returned_revenue",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"))
        val rev = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
        rev.join(Tables.customer(s, d),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("c_acctbal"), col("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""WITH rev AS (SELECT o_custkey,
             |    CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_returnflag = 'R'
             |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY o_custkey)
             |SELECT c_custkey, c_name, n_name, c_acctbal, revenue
             |FROM rev JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin),
      bench = true),

    // TPC-H Q14 shape — the promo-revenue share: one month of
    // lineitem joined to part (broadcast dimension), conditional
    // revenue as a CASE inside the same DECIMAL(18,4) sum, and ONE
    // final division of two exact decimals cast double — bit-identical
    // in both engines because a single IEEE op on identical inputs is
    // deterministic (the discipline: never SUM floats, dividing two
    // exact sums once is fine).
    QuerySpec("q14_promo_revenue_share",
      (s, d) => {
        val disc = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .agg(
            sum(when(col("p_type") === "ECONOMY", disc)
              .otherwise(lit(0).cast(DecimalType(18, 4)))).as("economy_rev"),
            sum(disc).as("total_rev"))
          .select(
            col("economy_rev").cast("double").as("economy_revenue"),
            col("total_rev").cast("double").as("total_revenue"),
            (col("economy_rev").cast("double") * 100.0 /
              col("total_rev").cast("double")).as("economy_pct"))
      },
      Some("""SELECT
             |  CAST(sum(CASE WHEN p_type = 'ECONOMY'
             |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
             |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS economy_revenue,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
             |  CAST(sum(CASE WHEN p_type = 'ECONOMY'
             |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
             |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0 /
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS economy_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin),
      bench = true),

    // Burst detection over the event stream: hours where an event
    // type's volume exceeds 2× its median hourly volume — the
    // monitoring query behind every traffic-anomaly alert. The
    // corpus collapses to the (type, hour) count frame first
    // (value-domain scale), the exact median comes from the
    // middle-row idiom, and the burst decision cross-multiplies
    // (n·cnt > 2·sum) so no division decides anything; the reported
    // median is one exact-integer division rendered double.
    QuerySpec("events_burst_hours",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .select(col("event_type"),
            expr("unix_millis(ts) div 3600000").as("hour"))
          .groupBy(col("event_type"), col("hour"))
          .agg(count(lit(1)).as("n"))
        val byType = Window.partitionBy(col("event_type"))
        val ranked = hourly
          .withColumn("rn", row_number().over(byType.orderBy(col("n"))))
          .withColumn("cnt", count(lit(1)).over(byType))
        val med = ranked.filter(col("rn") === expr("(cnt + 1) div 2") ||
            col("rn") === expr("(cnt + 2) div 2"))
          .groupBy(col("event_type"))
          .agg(sum(col("n")).as("msum"), count(lit(1)).as("mcnt"))
        hourly.join(broadcast(med), Seq("event_type"))
          .filter(col("n") * col("mcnt") > lit(2L) * col("msum"))
          .select(col("event_type"), col("hour"), col("n").as("n_events"),
            (col("msum").cast("double") / col("mcnt")).as("median_hourly"))
          .orderBy(col("event_type"), col("hour"))
      },
      Some("""WITH hourly AS (SELECT event_type,
             |    epoch_ms(ts) // 3600000 AS hour, count(*)::BIGINT AS n
             |  FROM events GROUP BY 1, 2),
             |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
             |      ORDER BY n) AS rn,
             |    count(*) OVER (PARTITION BY event_type) AS cnt
             |  FROM hourly),
             |med AS (SELECT event_type, sum(n)::BIGINT AS msum,
             |    count(*)::BIGINT AS mcnt
             |  FROM r WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2
             |  GROUP BY event_type)
             |SELECT h.event_type, h.hour, h.n AS n_events,
             |  CAST(msum AS DOUBLE) / mcnt AS median_hourly
             |FROM hourly h JOIN med USING (event_type)
             |WHERE h.n * mcnt > 2 * msum
             |ORDER BY h.event_type, h.hour""".stripMargin)),

    // Mergeable sketch COLUMNS — the 100 TB pattern for rollup-able
    // distinct counts: per-day DataSketches HLL sketches built once
    // (`hll_sketch_agg`), then UNIONED to any coarser grain
    // (`hll_union_agg`) without touching rows again — what
    // approx_count_distinct can't do (its estimate isn't a value you
    // can re-aggregate). Emitted per day plus the unioned total row
    // (day = −1), each contract-checked ±5 % against the exact
    // distinct (DataSketches estimates are insertion-order-
    // independent, so the booleans are deterministic, the
    // agg_approx_users discipline).
    QuerySpec("distinct_users_rollup",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("unix_millis(ts) div 86400000").as("day"),
            col("user_id"))
        val daily = ev.groupBy(col("day")).agg(
          expr("hll_sketch_agg(user_id)").as("sk"),
          countDistinct(col("user_id")).as("n_exact"))
        val dailyChecked = daily.select(col("day"), col("n_exact"),
          (abs(expr("hll_sketch_estimate(sk)") - col("n_exact")) * 20
            <= col("n_exact")).as("hll_ok"))
        val total = daily
          .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
          .crossJoin(broadcast(ev.agg(
            countDistinct(col("user_id")).as("n_exact"))))
          .select(lit(-1L).as("day"), col("n_exact"),
            (abs(col("est") - col("n_exact")) * 20 <= col("n_exact"))
              .as("hll_ok"))
        dailyChecked.unionByName(total).orderBy(col("day"))
      },
      Some("""WITH e AS (SELECT epoch_ms(ts) // 86400000 AS day, user_id
             |  FROM events),
             |d AS (SELECT day, count(DISTINCT user_id)::BIGINT AS n_exact
             |  FROM e GROUP BY day)
             |SELECT day, n_exact, true AS hll_ok FROM d
             |UNION ALL
             |SELECT -1, count(DISTINCT user_id)::BIGINT, true FROM e
             |ORDER BY day""".stripMargin)),

    // TPC-H Q4 shape — the EXISTS-correlated count: orders (by
    // priority) having at least one line shipped more than 90 days
    // after the order date. The correlation plans as one LEFT SEMI
    // join on the order key with the date comparison as the join
    // condition — never a per-order subquery; day arithmetic in epoch
    // millis so both engines compare identically.
    QuerySpec("q4_late_shipments",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderpriority"),
            // the TPC-H dates are TIMESTAMP_NTZ; the session is pinned
            // UTC, so the cast is wall-clock-identity in both engines
            unix_millis(col("o_orderdate").cast("timestamp")).as("oms"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"),
            unix_millis(col("l_shipdate").cast("timestamp")).as("sms"))
        ord.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("sms") > col("oms") + lit(90L * 86400000L),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderpriority,
             |    epoch_ms(o_orderdate) AS oms FROM orders),
             |l AS (SELECT l_orderkey, epoch_ms(l_shipdate) AS sms
             |  FROM lineitem)
             |SELECT o_orderpriority, count(*)::BIGINT AS n_orders
             |FROM o WHERE EXISTS (SELECT 1 FROM l
             |  WHERE l.l_orderkey = o.o_orderkey
             |    AND l.sms > o.oms + 90::BIGINT * 86400000)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin),
      bench = true),

    // TPC-H Q7 shape — cross-region trade volume: revenue flowing
    // between two regions, by (supplier region, customer region,
    // year), in BOTH directions (regions rather than Q7's nation pair
    // so the answer is populated at every test SF; the plan shape —
    // two independent geography dimension chains meeting at the fact —
    // is identical). Both chains restrict to the pair BEFORE joining
    // (dimension pruning — the fact side shrinks at the earliest join,
    // not in a post-filter), the supplier chain broadcasts, the
    // customer chain stays a keyed join; years via year() under the
    // pinned UTC session so both engines bucket identically; money
    // through the DECIMAL(18,4) discipline.
    QuerySpec("q7_nation_trade_volume",
      (s, d) => {
        val pair = Seq("AFRICA", "AMERICA")
        val sr = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
              .join(broadcast(Tables.region(s, d)
                .filter(col("r_name").isin(pair: _*))),
                col("n_regionkey") === col("r_regionkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("r_name").as("supp_region"))
        val cr = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)
              .join(broadcast(Tables.region(s, d)
                .filter(col("r_name").isin(pair: _*))),
                col("n_regionkey") === col("r_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("r_name").as("cust_region"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
            col("l_extendedprice"), col("l_discount"))
        li.join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cr, col("o_custkey") === col("c_custkey"))
          .join(broadcast(sr), col("l_suppkey") === col("s_suppkey"))
          .filter(col("supp_region") =!= col("cust_region"))
          .groupBy(col("supp_region"), col("cust_region"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
          .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
      },
      Some("""SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
             |  year(l_shipdate)::BIGINT AS l_year,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation sn ON s_nationkey = sn.n_nationkey
             |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
             |  JOIN nation cn ON c_nationkey = cn.n_nationkey
             |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
             |WHERE sr.r_name IN ('AFRICA', 'AMERICA')
             |  AND cr.r_name IN ('AFRICA', 'AMERICA')
             |  AND sr.r_name <> cr.r_name
             |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),
      bench = true),

    // TPC-H Q8 shape — market share: of all PROMO-part revenue sold
    // into AMERICA-region customers over two years, what fraction came
    // from NATION_1's suppliers, per year. The share is two exact
    // DECIMAL sums (conditional numerator via CASE inside the same
    // aggregate — one pass, the q14 discipline) divided ONCE as
    // doubles — a single IEEE op on identical inputs, bit-stable in
    // both engines. part/supplier/nation-region chains broadcast; the
    // orders⨝customer chain stays keyed.
    QuerySpec("q8_market_share",
      (s, d) => {
        val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))
        val americaCust = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)
              .join(broadcast(Tables.region(s, d)
                .filter(col("r_name") === "AMERICA")),
                col("n_regionkey") === col("r_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"))
        val sn = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val promo = Tables.part(s, d).filter(col("p_type") === "PROMO")
          .select(col("p_partkey"))
        val ord = Tables.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
          .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(americaCust, col("o_custkey") === col("c_custkey"), "left_semi")
          .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(
            sum(when(col("supp_nation") === "NATION_1", vol)
              .otherwise(lit(0).cast(DecimalType(18, 4))))
              .cast("double").as("nation_revenue"),
            sum(vol).cast("double").as("total_revenue"))
          .withColumn("mkt_share",
            col("nation_revenue") / col("total_revenue"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT year(o_orderdate)::BIGINT AS o_year,
             |  CAST(sum(CASE WHEN n_sup.n_name = 'NATION_1'
             |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
             |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_revenue,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
             |  CAST(sum(CASE WHEN n_sup.n_name = 'NATION_1'
             |    THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
             |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS mkt_share
             |FROM lineitem
             |  JOIN part ON l_partkey = p_partkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation n_sup ON s_nationkey = n_sup.n_nationkey
             |WHERE p_type = 'PROMO'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND o_custkey IN (SELECT c_custkey FROM customer
             |    JOIN nation ON c_nationkey = n_nationkey
             |    JOIN region ON n_regionkey = r_regionkey
             |    WHERE r_name = 'AMERICA')
             |GROUP BY 1 ORDER BY 1""".stripMargin),
      bench = true),

    // TPC-H Q19 shape — the disjunctive-predicate revenue: three
    // brand/size/quantity conjunctions OR-ed together across the
    // lineitem⨝part join. The interesting plan property is that the
    // per-table halves of the disjunction still reach the SCANS
    // (Catalyst derives `p_size <= 15` and quantity bounds from the
    // OR), while the cross-table residual evaluates on the joined row
    // — a single broadcast join, no union-of-three-queries rewrite.
    QuerySpec("q19_disjunctive_revenue",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"),
            col("l_extendedprice"), col("l_discount"))
        val p = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      },
      Some("""SELECT
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
             |    AS DECIMAL(18,4))) AS DOUBLE) AS revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
             |    AND l_quantity BETWEEN 1 AND 11)
             |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             |    AND l_quantity BETWEEN 10 AND 20)
             |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      bench = true),

    // TPC-H Q13 shape — customer order-count distribution: LEFT OUTER
    // join customer→orders (so zero-order customers land in the c_count
    // = 0 bucket) with an order-side predicate (the schema has no
    // o_comment, so the NOT-LIKE filter is stood in by excluding
    // 1-URGENT orders — same plan: the filter prunes the outer join's
    // right side BEFORE the join), then a two-level aggregate: count
    // per customer, histogram over the counts. The second aggregate
    // runs on the |customers|-row frame, map-side combined.
    QuerySpec("q13_custorder_distribution",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_orderkey"), col("o_custkey"))
        val perCust = Tables.customer(s, d).select(col("c_custkey"))
          .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""WITH co AS (SELECT c_custkey,
             |    count(o_orderkey)::BIGINT AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |SELECT c_count, count(*)::BIGINT AS custdist
             |FROM co GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      bench = true),

    // TPC-H Q21 shape — suppliers who kept orders waiting: late line
    // items on multi-supplier finalized orders where ONLY this
    // supplier was late. The schema has no commit/receipt dates, so
    // "late" is stood in by l_shipdate > o_orderdate + 60 days — the
    // plan shape (the canonical EXISTS/NOT-EXISTS pair as one LEFT
    // SEMI plus one LEFT ANTI self-join on the order key, never a
    // correlated per-row probe) is the thing being pinned. The late
    // frame is computed ONCE and persisted mentally as a CTE on both
    // sides of the anti-join; supplier names broadcast.
    QuerySpec("q21_waiting_suppliers",
      (s, d) => {
        val ordF = Tables.orders(s, d)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val late = li
          .join(ordF, col("l_orderkey") === col("o_orderkey"))
          .filter(unix_millis(col("l_shipdate").cast("timestamp")) >
            unix_millis(col("o_orderdate").cast("timestamp")) +
              lit(60L * 86400000L))
          .select(col("l_orderkey"), col("l_suppkey"))
        // the probe sides re-project under fresh names (new attribute
        // ids) so the self-joins stay unambiguous
        val anyOther = li.select(col("l_orderkey").as("a_orderkey"),
          col("l_suppkey").as("a_suppkey"))
        val lateOther = late.select(col("l_orderkey").as("b_orderkey"),
          col("l_suppkey").as("b_suppkey"))
        // EXISTS: some other supplier shipped on this order at all
        val withOther = late.join(anyOther,
          col("l_orderkey") === col("a_orderkey") &&
            col("l_suppkey") =!= col("a_suppkey"), "left_semi")
        // NOT EXISTS: no OTHER supplier was late on this order
        val onlyThis = withOther.join(lateOther,
          col("l_orderkey") === col("b_orderkey") &&
            col("l_suppkey") =!= col("b_suppkey"), "left_anti")
        onlyThis
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some("""WITH ordf AS (SELECT o_orderkey, o_orderdate FROM orders
             |  WHERE o_orderstatus = 'F'),
             |late AS (SELECT l_orderkey, l_suppkey
             |  FROM lineitem JOIN ordf ON l_orderkey = o_orderkey
             |  WHERE epoch_ms(l_shipdate) >
             |    epoch_ms(o_orderdate) + 60::BIGINT * 86400000)
             |SELECT s_name, count(*)::BIGINT AS numwait
             |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM late l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY s_name
             |ORDER BY numwait DESC, s_name""".stripMargin),
      bench = true),

    // TPC-H Q15 shape — top supplier(s): per-supplier revenue over a
    // three-month ship window (the "revenue view"), then the suppliers
    // achieving the maximum. The argmax is EXACT: revenue stays
    // DECIMAL through the comparison (double equality would be
    // fragile) and only the output casts to double. The max rides a
    // 1-row broadcast joined back against the |suppliers|-row revenue
    // frame — never a global window over the corpus.
    QuerySpec("q15_top_supplier",
      (s, d) => {
        // NOT pinned (r17, measured): rev is consumed twice (max +
        // join), but pinning benched 0.43 → 1.40 s — the cache build
        // dwarfs re-running a quarter-filtered pushed-down scan.
        val rev = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).as("total_rev"))
        val mx = rev.agg(max(col("total_rev")).as("mx"))
        rev.join(broadcast(mx), col("total_rev") === col("mx"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"),
            col("total_rev").cast("double").as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (SELECT l_suppkey,
             |    sum(CAST(l_extendedprice * (1.0 - l_discount)
             |      AS DECIMAL(18,4))) AS total_rev
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
             |  GROUP BY l_suppkey)
             |SELECT s_suppkey, s_name,
             |  CAST(total_rev AS DOUBLE) AS total_revenue
             |FROM rev JOIN supplier ON l_suppkey = s_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM rev)
             |ORDER BY s_suppkey""".stripMargin),
      bench = true),

    // TPC-H Q17 shape — small-quantity revenue: lineitems of one
    // brand's parts whose quantity is below 20 % of that part's average
    // quantity. The correlated per-part average is ONE aggregate
    // joined back (never a per-row subquery), and the threshold
    // comparison is cross-multiplied (5·qty·n < Σqty) so no division
    // decides membership — quantities are integral, so the arithmetic
    // is exact in both engines. The brand's part list broadcasts into
    // the fact scan; money through the DECIMAL discipline with the /7
    // as one final IEEE op. (Schema has no p_container — brand-only
    // filter, same plan shape.)
    QuerySpec("q17_small_quantity_revenue",
      (s, d) => {
        val pk = Tables.part(s, d).filter(col("p_brand") === "Brand#1")
          .select(col("p_partkey"))
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity").cast("long").as("qty"),
            col("l_extendedprice"))
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        val perPart = li.groupBy(col("l_partkey").as("agg_partkey"))
          .agg(sum(col("qty")).as("sq"), count(lit(1)).as("nq"))
        li.join(perPart, col("l_partkey") === col("agg_partkey"))
          .filter(col("qty") * lit(5L) * col("nq") < col("sq"))
          .agg((sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double") / 7.0).as("avg_yearly"))
      },
      Some("""WITH li AS (SELECT l_partkey,
             |    CAST(l_quantity AS BIGINT) AS qty, l_extendedprice
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE p_brand = 'Brand#1'),
             |pp AS (SELECT l_partkey AS agg_partkey,
             |    CAST(sum(qty) AS BIGINT) AS sq, count(*) AS nq
             |  FROM li GROUP BY 1)
             |SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
             |    AS DOUBLE) / 7.0 AS avg_yearly
             |FROM li JOIN pp ON l_partkey = agg_partkey
             |WHERE qty * 5 * nq < sq""".stripMargin),
      bench = true),

    // TPC-H Q22 shape — idle rich accounts: customers with an account
    // balance above the positive-balance average who have placed no
    // orders SINCE 2001, counted per segment (the schema has no phone
    // prefix — c_mktsegment carries the grouping; and unlike stock
    // TPC-H every synthetic customer has *some* order, so "idle" is
    // date-windowed — the anti-join side carries a pushed-down date
    // filter, same plan). The global average is a 1-row broadcast
    // compared by CROSS-MULTIPLICATION (cents·n > Σcents) so no
    // division decides membership; balances go through exact integer
    // cents (round(x·100) — 2dp doubles land within 1e-9 of the
    // integer, so rounding is deterministic in both engines); "no
    // recent orders" is one LEFT ANTI join, never a correlated probe.
    QuerySpec("q22_idle_balance_customers",
      (s, d) => {
        val cents = round(col("c_acctbal") * 100).cast("long")
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"), cents.as("cents"))
        val tot = cust.filter(col("cents") > 0)
          .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
        cust.crossJoin(broadcast(tot))
          .filter(col("cents") * col("n") > col("s"))
          .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2001-01-01").cast("date"))
            .select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("numcust"),
            (sum(col("cents")).cast("double") / 100.0).as("totacctbal"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH cust AS (SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |  FROM customer),
             |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS s, count(*) AS n
             |  FROM cust WHERE cents > 0)
             |SELECT c_mktsegment, count(*)::BIGINT AS numcust,
             |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100.0
             |    AS totacctbal
             |FROM cust CROSS JOIN tot
             |WHERE cents * n > s
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |    WHERE o_custkey = c_custkey
             |      AND o_orderdate >= DATE '2001-01-01')
             |GROUP BY c_mktsegment
             |ORDER BY c_mktsegment""".stripMargin),
      bench = true),

    // TPC-H Q2 shape — min-cost supplier: for each qualifying part,
    // the European supplier(s) quoting the region's minimum supply
    // cost. The correlated min subquery is ONE aggregate over the
    // region-filtered partsupp frame joined back on (part, cost) —
    // never a per-row probe — and the cost equality compares
    // DECIMAL(18,2) (exact), only the output casts to double. The
    // supplier→nation→region snowflake broadcasts into the partsupp
    // scan; the part filter broadcasts into the join-back. Top-100 by
    // a total order (acctbal desc, nation, supplier, part) plans as
    // TakeOrderedAndProject, never a global sort.
    QuerySpec("q2_min_cost_supplier",
      (s, d) => {
        val esupp = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
            col("n_name"))
        // NOT pinned (r17, measured): psr is consumed twice (min-cost
        // aggregate + final join), but pinning it benched WORSE
        // (2.02 → 2.29 s) — the columnar cache build costs more than
        // re-running the pushed-down lineitem aggregation at bench
        // scale, and the recompute is two map-side-combined passes a
        // 100 TB run would take from the (then materialized) partsupp
        // table anyway.
        val psr = partsupp(s, d)
          .join(broadcast(esupp), col("ps_suppkey") === col("s_suppkey"))
        val mc = psr.groupBy(col("ps_partkey").as("m_partkey"))
          .agg(min(col("ps_supplycost")).as("m_cost"))
        val pf = Tables.part(s, d)
          .filter(col("p_size") <= 15 && col("p_type") === "LARGE")
          .select(col("p_partkey"), col("p_brand"))
        psr.join(mc, col("ps_partkey") === col("m_partkey") &&
            col("ps_supplycost") === col("m_cost"))
          .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), col("p_brand"),
            col("ps_supplycost").cast("double").as("supplycost"))
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some(s"""WITH $psSql,
              |esupp AS (SELECT s_suppkey, s_name, s_acctbal, n_name
              |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |  JOIN region ON n_regionkey = r_regionkey
              |  WHERE r_name = 'EUROPE'),
              |psr AS (SELECT ps_partkey, ps_supplycost, s_name,
              |    s_acctbal, n_name
              |  FROM ps JOIN esupp ON ps_suppkey = s_suppkey),
              |mc AS (SELECT ps_partkey AS m_partkey,
              |    min(ps_supplycost) AS m_cost
              |  FROM psr GROUP BY 1)
              |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
              |  CAST(ps_supplycost AS DOUBLE) AS supplycost
              |FROM psr JOIN mc ON ps_partkey = m_partkey
              |  AND ps_supplycost = m_cost
              |JOIN part ON ps_partkey = p_partkey
              |WHERE p_size <= 15 AND p_type = 'LARGE'
              |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
              |LIMIT 100""".stripMargin),
      bench = true),

    // TPC-H Q9 shape — product-type profit by nation and year: every
    // lineitem of matching parts priced against its pair's supply
    // cost. Exactness: revenue is the 2dp×2dp product at
    // DECIMAL(18,4); cost is DECIMAL(18,2) × BIGINT quantity (exact
    // integer arithmetic); the two sums convert to double SEPARATELY
    // and subtract as one final IEEE op, identical in both engines.
    // (The supplycost stand-in is a line price, not a unit price —
    // see [[partsupp]] — so profit is legitimately negative; the
    // five-way join shape is the thing being pinned: dims broadcast,
    // the one fact-sized shuffle is lineitem↔partsupp on the pair
    // key, orders joins on its own key.)
    QuerySpec("q9_product_profit",
      (s, d) => {
        val pk = Tables.part(s, d).filter(col("p_name").like("%red%"))
          .select(col("p_partkey"))
        val prof = Tables.lineitem(s, d)
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
          .join(partsupp(s, d), col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .join(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("n_name").as("nation"),
            year(col("o_orderdate")).as("o_year"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast(DecimalType(18, 4)).as("rev"),
            (col("ps_supplycost") * col("l_quantity").cast("long"))
              .as("cost"))
        prof.groupBy(col("nation"), col("o_year"))
          .agg((sum(col("rev")).cast("double") -
            sum(col("cost")).cast("double")).as("profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some(s"""WITH $psSql,
              |prof AS (SELECT n_name AS nation,
              |    year(o_orderdate) AS o_year,
              |    CAST(l_extendedprice * (1.0 - l_discount)
              |      AS DECIMAL(18,4)) AS rev,
              |    ps_supplycost * CAST(l_quantity AS BIGINT) AS cost
              |  FROM lineitem
              |  JOIN ps ON l_partkey = ps_partkey
              |    AND l_suppkey = ps_suppkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation ON s_nationkey = n_nationkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN part ON l_partkey = p_partkey
              |  WHERE p_name LIKE '%red%')
              |SELECT nation, o_year,
              |  CAST(sum(rev) AS DOUBLE) - CAST(sum(cost) AS DOUBLE)
              |    AS profit
              |FROM prof GROUP BY nation, o_year
              |ORDER BY nation, o_year DESC""".stripMargin),
      bench = true),

    // TPC-H Q11 shape — important stock: per-part inventory value for
    // one nation's suppliers, kept where the part's value exceeds
    // 1/1000 of the nation total. The global scalar is a 1-ROW
    // BROADCAST compared by cross-multiplication (value·1000 > total,
    // exact decimal integer arithmetic — no fraction, no division) —
    // never a window over the per-part frame; the total reuses the
    // per-part aggregate (sum of sums) instead of re-scanning.
    QuerySpec("q11_important_stock",
      (s, d) => {
        val nsupp = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        // NOT pinned (r17, measured): pv is consumed twice (total +
        // threshold filter), but pinning benched worse (1.58 → 1.90 s)
        // for the same reason as q2's psr — cache build > recompute
        // for cheap codegen'd aggregates at this scale.
        val pv = partsupp(s, d)
          .join(broadcast(nsupp), col("ps_suppkey") === col("s_suppkey"))
          .groupBy(col("ps_partkey"))
          .agg(sum(col("ps_supplycost") * col("ps_availqty")).as("value"))
        val tot = pv.agg(sum(col("value")).as("t"))
        pv.crossJoin(broadcast(tot))
          .filter(col("value") * lit(1000L) > col("t"))
          .select(col("ps_partkey"), col("value").cast("double").as("value"))
          .orderBy(col("value").desc, col("ps_partkey"))
      },
      Some(s"""WITH $psSql,
              |pv AS (SELECT ps_partkey,
              |    sum(ps_supplycost * ps_availqty) AS value
              |  FROM ps JOIN supplier ON ps_suppkey = s_suppkey
              |  JOIN nation ON s_nationkey = n_nationkey
              |  WHERE n_name = 'NATION_3'
              |  GROUP BY ps_partkey),
              |tot AS (SELECT sum(value) AS t FROM pv)
              |SELECT ps_partkey, CAST(value AS DOUBLE) AS value
              |FROM pv CROSS JOIN tot
              |WHERE value * 1000 > t
              |ORDER BY value DESC, ps_partkey""".stripMargin),
      bench = true),

    // TPC-H Q12 shape — shipping class vs order priority: late lines
    // (shipped >30 days after the order date — the schema has no
    // commit/receipt dates) in one ship-year, counted into high- and
    // low-priority buckets per return-flag class. ONE fact-dim join
    // and ONE aggregate carrying both conditional sums — the scan
    // filter pushes the ship window down to the parquet scan.
    QuerySpec("q12_shipclass_priority",
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            col("o_orderdate"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .filter(unix_millis(col("l_shipdate").cast("timestamp")) >
            unix_millis(col("o_orderdate").cast("timestamp")) +
              lit(30L * 86400000L))
          .groupBy(col("l_returnflag").as("shipclass"))
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy(col("shipclass"))
      },
      Some("""SELECT l_returnflag AS shipclass,
             |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
             |  sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND epoch_ms(l_shipdate) >
             |    epoch_ms(o_orderdate) + 30::BIGINT * 86400000
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin),
      bench = true),

    // TPC-H Q16 shape — supplier diversity per part profile: distinct
    // suppliers per (brand, type, size) over qualifying parts,
    // excluding flagged suppliers (stood in by negative balance — the
    // schema has no s_comment). The NOT-IN is ONE LEFT ANTI join
    // against the (tiny, broadcast) flagged-supplier frame — never a
    // correlated probe; the part filter broadcasts into the partsupp
    // pair frame, which is already distinct on (part, supplier).
    QuerySpec("q16_parts_supplier_counts",
      (s, d) => {
        val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        val pf = Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
          .select(col("p_partkey"), col("p_brand"), col("p_type"),
            col("p_size"))
        partsupp(s, d)
          .join(broadcast(bad), col("ps_suppkey") === col("s_suppkey"),
            "left_anti")
          .join(broadcast(pf), col("ps_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some(s"""WITH $psSql
              |SELECT p_brand, p_type, p_size,
              |  count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
              |FROM ps JOIN part ON ps_partkey = p_partkey
              |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
              |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
              |  AND ps_suppkey NOT IN
              |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
              |GROUP BY 1, 2, 3
              |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin),
      bench = true),

    // TPC-H Q20 shape — excess-stock suppliers: one nation's suppliers
    // holding some matching part's total stock at more than 5× what
    // that pair shipped in the probe year. NESTED SEMI shape: the
    // part-name filter semi-joins (broadcast) into partsupp, the
    // correlated per-pair window sum is ONE aggregate LEFT-joined back
    // (absent window → 0 via coalesce, exact integer quantities), and
    // the qualifying pair set semi-joins into supplier — three joins,
    // zero correlated probes, zero cartesians.
    QuerySpec("q20_excess_stock_suppliers",
      (s, d) => {
        val redParts = Tables.part(s, d).filter(col("p_name").like("red%"))
          .select(col("p_partkey"))
        val wq = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).cast("long").as("w"))
        val excess = partsupp(s, d)
          .join(broadcast(redParts), col("ps_partkey") === col("p_partkey"),
            "left_semi")
          .join(wq, col("ps_partkey") === col("l_partkey") &&
            col("ps_suppkey") === col("l_suppkey"), "left_outer")
          .filter(col("ps_availqty") > lit(5L) * coalesce(col("w"), lit(0L)))
          .select(col("ps_suppkey"))
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"))
          .orderBy(col("s_name"))
      },
      Some(s"""WITH $psSql,
              |wq AS (SELECT l_partkey, l_suppkey,
              |    CAST(sum(l_quantity) AS BIGINT) AS w
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              |  GROUP BY 1, 2),
              |excess AS (SELECT DISTINCT ps_suppkey FROM ps
              |  LEFT JOIN wq ON ps_partkey = l_partkey
              |    AND ps_suppkey = l_suppkey
              |  WHERE ps_partkey IN
              |      (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
              |    AND ps_availqty > 5 * coalesce(w, 0))
              |SELECT s_suppkey, s_name
              |FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |WHERE n_name = 'NATION_3'
              |  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
              |ORDER BY s_name""".stripMargin),
      bench = true),

    // Explicit GROUPING SETS (the rollup/cube queries' general form):
    // brand-only, type-only, and grand-total aggregates in ONE pass —
    // Catalyst plans one Expand over the scan, not three scans.
    // grouping_id() disambiguates the all-null rows exactly as in the
    // rollup query; money through the DECIMAL discipline.
    QuerySpec("grouping_sets_part_mix",
      (s, d) => {
        Tables.part(s, d).createOrReplaceTempView("part_v")
        s.sql("""SELECT p_brand, p_type,
                |  CAST(grouping_id(p_brand, p_type) AS BIGINT) AS gid,
                |  count(*) AS n_parts,
                |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                |    AS sum_retail
                |FROM part_v
                |GROUP BY GROUPING SETS ((p_brand), (p_type), ())
                |ORDER BY gid, p_brand, p_type""".stripMargin)
      },
      Some("""SELECT p_brand, p_type,
             |  CAST(grouping(p_brand) * 2 + grouping(p_type) AS BIGINT)
             |    AS gid,
             |  count(*)::BIGINT AS n_parts,
             |  CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_retail
             |FROM part
             |GROUP BY GROUPING SETS ((p_brand), (p_type), ())
             |ORDER BY gid, p_brand, p_type""".stripMargin)),

    // Year-over-year revenue growth: the corpus collapses to the
    // per-year cents total first (integer-exact), then ONE lag window
    // over the |years|-row frame computes growth in exact ppm —
    // division only by the prior year's integer total, truncating
    // toward zero in both engines (verified on the down years).
    QuerySpec("orders_yoy_growth",
      (s, d) => {
        val byYear = Tables.orders(s, d)
          .select(year(col("o_orderdate")).cast("long").as("yr"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy(col("yr"))
          .agg(sum(col("cents")).as("rev_cents"),
            count(lit(1)).as("n_orders"))
        byYear
          .withColumn("prev_cents",
            lag(col("rev_cents"), 1).over(Window.orderBy(col("yr"))))
          // negative growth: BOTH engines' integer division truncates
          // toward zero (Spark div, DuckDB // on integers — verified
          // against the 1998/2001 down years), so plain div matches
          .select(col("yr"), col("n_orders"), col("rev_cents"),
            expr("((rev_cents - prev_cents) * 1000000) div prev_cents")
              .as("growth_ppm"))
          .orderBy(col("yr"))
      },
      Some("""WITH y AS (SELECT year(o_orderdate)::BIGINT AS yr,
             |    sum(CAST(floor(o_totalprice * 100) AS BIGINT))::BIGINT
             |      AS rev_cents,
             |    count(*)::BIGINT AS n_orders
             |  FROM orders GROUP BY 1),
             |g AS (SELECT *, lag(rev_cents) OVER (ORDER BY yr)
             |    AS prev_cents FROM y)
             |SELECT yr, n_orders, rev_cents,
             |  (((rev_cents - prev_cents) * 1000000) // prev_cents)::BIGINT
             |    AS growth_ppm
             |FROM g ORDER BY yr""".stripMargin)),

    // DAU/WAU stickiness: daily actives over trailing-7-day actives,
    // the engagement ratio every product dashboard tracks. The
    // trailing window is NOT a range join: each (user, day) pair
    // contributes itself to the 7 window anchors it falls in (one
    // generator, 7× the deduped pair count), then both sides are
    // plain distinct aggregates — the bucketization discipline
    // (range_join_signup_hour) applied to sliding engagement windows.
    // Ratio in exact ppm.
    QuerySpec("events_dau_wau",
      (s, d) => {
        val du = Tables.events(s, d)
          .select(expr("unix_millis(ts) div 86400000").as("day"),
            col("user_id")).distinct()
        val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
        val wau = du
          .select(explode(sequence(col("day"), col("day") + 6L))
            .as("anchor"), col("user_id"))
          .distinct()
          .groupBy(col("anchor")).agg(count(lit(1)).as("wau"))
        dau.join(wau, col("day") === col("anchor"))
          .select(col("day"), col("dau"), col("wau"),
            expr("(dau * 1000000) div wau").as("stickiness_ppm"))
          .orderBy(col("day"))
      },
      Some("""WITH du AS (SELECT DISTINCT epoch_ms(ts) // 86400000 AS day,
             |    user_id FROM events),
             |dau AS (SELECT day, count(*)::BIGINT AS dau FROM du GROUP BY 1),
             |c AS (SELECT DISTINCT anchor, user_id FROM (
             |  SELECT unnest(range(day, day + 7)) AS anchor, user_id FROM du)),
             |wau AS (SELECT anchor, count(*)::BIGINT AS wau FROM c GROUP BY 1)
             |SELECT day, dau, wau,
             |  ((dau * 1000000) // wau)::BIGINT AS stickiness_ppm
             |FROM dau JOIN wau ON day = anchor
             |ORDER BY day""".stripMargin)),

    // Repeat-purchase cadence: the distribution of day-gaps between a
    // user's consecutive purchases — the metric behind replenishment
    // and churn models. One user-partitioned lag window over the
    // purchase subset, then a gap-bucket histogram (value-domain
    // scale); (ms, event_id) ordering keeps tie order engine-exact.
    QuerySpec("repeat_purchase_gaps",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        val gaps = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"),
            unix_millis(col("ts")).as("ms"))
          .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
          .filter(col("prev_ms").isNotNull)
          .select(expr("(ms - prev_ms) div 86400000").as("gap_days"))
        gaps.groupBy(col("gap_days"))
          .agg(count(lit(1)).as("n_gaps"))
          .orderBy(col("gap_days"))
      },
      Some("""WITH p AS (SELECT user_id, event_id, epoch_ms(ts) AS ms
             |  FROM events WHERE event_type = 'purchase'),
             |g AS (SELECT (ms - lag(ms) OVER (PARTITION BY user_id
             |    ORDER BY ms, event_id)) // 86400000 AS gap_days FROM p)
             |SELECT gap_days::BIGINT AS gap_days, count(*)::BIGINT AS n_gaps
             |FROM g WHERE gap_days IS NOT NULL
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Skew-mitigated join: the hot-key fact⨝dim join run through
    // ScaleJoins.saltedJoinDerived — the salt factor is MEASURED from
    // a seeded 5% key-histogram sample of the fact side (hottest key's
    // overflow of a level task, clamped), not hard-coded, so an
    // unskewed corpus pays zero replication and a one-hot-key corpus
    // spreads to the full task count. The salt is RESULT-INVISIBLE —
    // the oracle is the plain join. This is the explicit tool for
    // aggregate-into-join pipelines where AQE can't see the skew; the
    // post-join aggregate collapses the salt before anything reads it.
    QuerySpec("join_salted_hot_user",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            floor(col("value") * 100).cast("long").as("cents"))
        val dims = Tables.events(s, d)
          .filter(col("event_type") === "signup")
          .groupBy(col("user_id"))
          .agg(min(expr("unix_millis(ts) div 86400000")).as("signup_day"))
        graft.operators.ScaleJoins
          .saltedJoinDerived(ev, dims, "user_id")
          .groupBy(col("user_id"), col("signup_day"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
          .orderBy(col("user_id"))
      },
      Some("""WITH dims AS (SELECT user_id,
             |    min(epoch_ms(ts) // 86400000) AS signup_day
             |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
             |ev AS (SELECT user_id,
             |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events)
             |SELECT ev.user_id, signup_day, count(*)::BIGINT AS n_events,
             |  sum(cents)::BIGINT AS sum_cents
             |FROM ev JOIN dims ON ev.user_id = dims.user_id
             |GROUP BY ev.user_id, signup_day
             |ORDER BY ev.user_id""".stripMargin)),

    // SCD2 dimension build: collapse each user's event stream into
    // type-2 validity intervals of their "current state" (the latest
    // event_type), the warehouse-standard history table a batch
    // pipeline derives from a change stream. Consecutive repeats
    // collapse (an SCD2 row is a CHANGE, not an event); valid_to is
    // the next change's valid_from, NULL while current. Scale shape:
    // both windows partition by user_id — per-user cardinality, never
    // a global sort — and (ms, event_id) ordering makes tie order
    // engine-exact.
    QuerySpec("scd2_user_state",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            col("event_type"), unix_millis(col("ts")).as("ms"))
        val changes = ev
          .withColumn("prev", lag(col("event_type"), 1).over(byUser))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
        changes
          .withColumn("valid_to_ms", lead(col("ms"), 1).over(byUser))
          .select(col("user_id"), col("event_type").as("state"),
            col("ms").as("valid_from_ms"), col("valid_to_ms"),
            col("valid_to_ms").isNull.as("is_current"))
          .orderBy(col("user_id"), col("valid_from_ms"))
      },
      Some("""WITH ev AS (SELECT user_id, event_id, event_type,
             |    epoch_ms(ts) AS ms FROM events),
             |ch AS (SELECT *, lag(event_type) OVER w AS prev FROM ev
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
             |cg AS (SELECT user_id, event_id, event_type, ms FROM ch
             |  WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type AS state, ms AS valid_from_ms,
             |  lead(ms) OVER w AS valid_to_ms,
             |  lead(ms) OVER w IS NULL AS is_current
             |FROM cg WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)
             |ORDER BY user_id, valid_from_ms""".stripMargin)),

    // PageRank over the event-type transition graph: per-user lag
    // windows derive (src → dst) transition edges from the stream, and
    // five unrolled power iterations run in integer PPM arithmetic
    // (rank' = 150000/n + 0.85·Σ rank_u·w/out_u, every division a
    // floor div) so both engines agree bit-for-bit — the float-free
    // discipline the sampling gates use, applied to an iterative graph
    // algorithm. Scale shape: the corpus-scale work is ONE user-keyed
    // window + one (src, dst) aggregate; the iterations run over the
    // value-domain-scale edge list (|event types|² max), broadcast
    // joins only. At 100 TB with a billion-node graph the same loop
    // holds with the edge list disk-backed and each iteration one
    // shuffle — lineage is truncated per round the way
    // dedup_clusters' connected-components loop does.
    QuerySpec("pagerank_event_graph",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        val edges = TrackedCache.persist(Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            col("event_type").as("dst"), unix_millis(col("ts")).as("ms"))
          .withColumn("src", lag(col("dst"), 1).over(byUser))
          .filter(col("src").isNotNull)
          .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w")))
        val outW = edges.groupBy(col("src"))
          .agg(sum(col("w")).as("out_w"))
        val nodes = TrackedCache.persist(
          edges.select(col("src").as("event_type"))
            .union(edges.select(col("dst")))
            .distinct())
        val n = nodes.count()
        // The contracted graph is VALUE-DOMAIN scale (|event types|²
        // max — an enum alphabet, not a data-scale node set), so the
        // five power iterations fold driver-side over the collected
        // edge aggregate (r17) — the same bounded-driver-state pattern
        // as KMeans' K centroids. The previous distributed fold paid
        // ten broadcast-collect round trips for arithmetic over ~10²
        // rows (measured ~1.5 s of pure job latency at sf0.1). Exact
        // same integer-PPM arithmetic — floor div on non-negative
        // longs — so the result is bit-identical and the oracle
        // unchanged. A pathological alphabet falls back to the
        // distributed fold (the 100 TB billion-node story in the
        // header applies there).
        if (n <= 256) {
          val eRows = edges.collect()
            .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          val outWm = eRows.groupBy(_._1).map { case (k, rs) =>
            k -> rs.map(_._3).sum }
          val names = nodes.collect().map(_.getString(0))
          var rank: Map[String, Long] = names.map(_ -> 1000000L / n).toMap
          (1 to 5).foreach { _ =>
            val in = scala.collection.mutable.Map.empty[String, Long]
            eRows.foreach { case (src, dst, w) =>
              in(dst) = in.getOrElse(dst, 0L) + (rank(src) * w) / outWm(src)
            }
            rank = names.map(t =>
              t -> (150000L / n + 850L * in.getOrElse(t, 0L) / 1000L)).toMap
          }
          import s.implicits._
          rank.toSeq.toDF("event_type", "rank_ppm")
            .orderBy(col("rank_ppm").desc, col("event_type"))
        } else {
          val r0 = nodes.withColumn("rank_ppm", lit(1000000L / n))
          val rFinal = (1 to 5).foldLeft(r0) { (r, _) =>
            val contrib = edges
              .join(broadcast(r.withColumnRenamed("event_type", "src")), Seq("src"))
              .join(broadcast(outW), Seq("src"))
              .groupBy(col("dst"))
              .agg(sum(expr("(rank_ppm * w) div out_w")).as("in_ppm"))
            nodes.join(broadcast(contrib.withColumnRenamed("dst", "event_type")),
                Seq("event_type"), "left")
              .select(col("event_type"),
                (lit(150000L / n) +
                  expr("850 * coalesce(in_ppm, 0L) div 1000")).as("rank_ppm"))
          }
          rFinal.orderBy(col("rank_ppm").desc, col("event_type"))
        }
      },
      Some {
        val iter = (k: Int) =>
          s"""c$k AS (SELECT e.dst, sum((r.rank_ppm * e.w) // o.out_w) AS in_ppm
             |  FROM edges e JOIN r${k - 1} r ON e.src = r.event_type
             |  JOIN outw o ON e.src = o.src GROUP BY e.dst),
             |r$k AS (SELECT n.event_type,
             |    (150000 // nn.n) + 850 * coalesce(c.in_ppm, 0) // 1000 AS rank_ppm
             |  FROM nodes n CROSS JOIN nn LEFT JOIN c$k c ON n.event_type = c.dst)""".stripMargin
        s"""WITH ev AS (SELECT user_id, event_id, event_type AS dst,
           |    epoch_ms(ts) AS ms FROM events),
           |tr AS (SELECT dst, lag(dst) OVER (PARTITION BY user_id
           |    ORDER BY ms, event_id) AS src FROM ev),
           |edges AS (SELECT src, dst, count(*)::BIGINT AS w FROM tr
           |  WHERE src IS NOT NULL GROUP BY 1, 2),
           |outw AS (SELECT src, sum(w)::BIGINT AS out_w FROM edges GROUP BY 1),
           |nodes AS (SELECT DISTINCT src AS event_type FROM edges
           |  UNION SELECT DISTINCT dst FROM edges),
           |nn AS (SELECT count(*)::BIGINT AS n FROM nodes),
           |r0 AS (SELECT event_type, 1000000 // nn.n AS rank_ppm
           |  FROM nodes CROSS JOIN nn),
           |${(1 to 5).map(iter).mkString(",\n")}
           |SELECT event_type, rank_ppm::BIGINT AS rank_ppm FROM r5
           |ORDER BY rank_ppm DESC, event_type""".stripMargin
      },
      bench = true))
}
