package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Relational operator coverage over the TPC-H-ish testdata tables,
  * mapping to SURVEY §2.3 (projections/filters), §2.4 (joins), §2.5
  * (aggregations), §2.6 (windows), §2.7 (sorts/limits/top-k) and §2.8
  * (scalar functions). Every query is declarative DataFrame API so Catalyst
  * pushes filters/prunes columns into the parquet scans, and small join
  * sides are broadcast.
  */
object RelationalQueries {

  /** Shadows `functions.round`: every rounded output column in this file is
    * zero-sign-normalized (see [[graft.Norm.rz]]); the oracle SQL mirrors
    * with `round(x, n) + 0.0`.
    */
  private def round(c: Column, n: Int): Column = graft.Norm.rz(c, n)

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s))

  /** A3/A4/A5/P1: TPC-H Q1-shaped pricing summary — partial aggregation
    * (map-side combine) keeps the shuffle tiny at any scale: 6 groups.
    */
  val q1 = Q(
    "q1_pricing_summary",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          round(avg("l_extendedprice"), 6).as("avg_price"),
          round(avg("l_discount"), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""select l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) + 0.0 as sum_qty,
      round(sum(l_extendedprice), 2) + 0.0 as sum_base_price,
      round(sum(l_extendedprice * (1.0 - l_discount)), 4) + 0.0 as sum_disc_price,
      round(avg(l_quantity), 6) + 0.0 as avg_qty,
      round(avg(l_extendedprice), 6) + 0.0 as avg_price,
      round(avg(l_discount), 6) + 0.0 as avg_disc,
      count(*) as count_order
    from lineitem
    where l_shipdate <= timestamp '1998-09-02 00:00:00'
    group by l_returnflag, l_linestatus
    order by l_returnflag, l_linestatus"""),
    "A3-A5/P1: grouped pricing summary")

  /** J1/J2/P5: revenue per nation for one region — orders is the fact side;
    * region/nation are broadcast (tiny), customer joins pre-filtered.
    */
  val q2 = Q(
    "q2_region_revenue",
    (s, dir) => {
      val asiaNations = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = Tables.customer(s, dir)
        .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "n_name")
      Tables.orders(s, dir)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("n_name")
        .agg(
          round(sum("o_totalprice"), 2).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    },
    Some("""select n_name,
      round(sum(o_totalprice), 2) + 0.0 as revenue,
      count(*) as n_orders
    from orders
    join customer on o_custkey = c_custkey
    join nation on c_nationkey = n_nationkey
    join region on n_regionkey = r_regionkey
    where r_name = 'ASIA'
    group by n_name
    order by n_name"""),
    "J1/J2/P5: multi-way equi-join with broadcast dims")

  /** O5/W6: top-5 orders per market segment — deterministic tie-break on
    * o_orderkey, the canonical row_number top-k-per-group plan.
    */
  val q3 = Q(
    "q3_top_orders_per_segment",
    (s, dir) => {
      val joined = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      joined
        .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    },
    Some("""select * from (
      select c_mktsegment, o_orderkey, o_totalprice,
        row_number() over (partition by c_mktsegment
                           order by o_totalprice desc, o_orderkey) as rn
      from orders join customer on o_custkey = c_custkey) t
    where rn <= 5
    order by c_mktsegment, rn"""),
    "O5/W6: top-k per group via ranked window")

  /** W1: 5-row rolling average per user over the events stream. */
  val q4 = Q(
    "q4_rolling_avg",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
      Tables.events(s, dir)
        .select(
          col("user_id"), col("event_id"),
          round(avg("value").over(w), 6).as("rolling_value"))
        .orderBy("user_id", "event_id")
    },
    Some("""select user_id, event_id,
      round(avg(value) over (partition by user_id order by ts, event_id
        rows between 4 preceding and current row), 6) + 0.0 as rolling_value
    from events
    order by user_id, event_id"""),
    "W1: rolling mean window")

  /** W2/W3/W5: sessionization — LAG gap detection + running-sum session ids
    * (the gaps-and-islands shape of the reference's episode detection,
    * applied to an event stream with a 12 h inactivity gap).
    */
  val q5 = Q(
    "q5_sessionization",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapNs = 12L * 3600 * 1000000000L
      val lagged = Tables.events(s, dir)
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn(
          "is_new",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      lagged.groupBy("user_id", "session_id")
        .agg(
          count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("session_value"),
          min("event_id").as("first_event"),
          max("event_id").as("last_event"))
        .select(
          col("user_id"), col("session_id").cast("long").as("session_id"),
          col("n_events"), col("session_value"), col("first_event"),
          col("last_event"))
        .orderBy("user_id", "session_id")
    },
    Some("""with lagged as (
      select user_id, event_id, ts, value,
        case when lag(epoch_ns(ts)) over w is null
               or epoch_ns(ts) - lag(epoch_ns(ts)) over w > 43200000000000
             then 1 else 0 end as is_new
      from events
      window w as (partition by user_id order by ts, event_id)
    ), sessions as (
      select *, sum(is_new) over (partition by user_id order by ts, event_id
        rows between unbounded preceding and current row) as session_id
      from lagged
    )
    select user_id, cast(session_id as bigint) as session_id,
      count(*) as n_events,
      round(sum(value), 2) + 0.0 as session_value,
      min(event_id) as first_event,
      max(event_id) as last_event
    from sessions
    group by user_id, session_id
    order by user_id, session_id"""),
    "W2/W3/W5: sessionization via lag + running sum")

  /** A3/A5/F3: per-user conditional aggregation (pivot-style counters). */
  val q6 = Q(
    "q6_user_activity",
    (s, dir) => {
      def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0))
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_events"),
          cnt("click").as("n_clicks"),
          cnt("view").as("n_views"),
          cnt("purchase").as("n_purchases"),
          cnt("error").as("n_errors"),
          cnt("signup").as("n_signups"),
          round(avg("value"), 6).as("avg_value"),
          round(sum(when(col("event_type") === "purchase", col("value"))
            .otherwise(0.0)), 2).as("purchase_value"),
          round(avg(when(col("event_type") === "purchase", col("value"))), 6)
            .as("avg_purchase_value"))
        .orderBy("user_id")
    },
    Some("""select user_id,
      count(*) as n_events,
      cast(sum(case when event_type = 'click' then 1 else 0 end) as bigint) as n_clicks,
      cast(sum(case when event_type = 'view' then 1 else 0 end) as bigint) as n_views,
      cast(sum(case when event_type = 'purchase' then 1 else 0 end) as bigint) as n_purchases,
      cast(sum(case when event_type = 'error' then 1 else 0 end) as bigint) as n_errors,
      cast(sum(case when event_type = 'signup' then 1 else 0 end) as bigint) as n_signups,
      round(avg(value), 6) + 0.0 as avg_value,
      round(sum(case when event_type = 'purchase' then value else 0.0 end), 2) + 0.0 as purchase_value,
      round(avg(case when event_type = 'purchase' then value end), 6) + 0.0 as avg_purchase_value
    from events
    group by user_id
    order by user_id"""),
    "A3/A5/F3: conditional counters + NULL-skipping conditional avg")

  /** P8: HAVING filter on an aggregate. */
  val q7 = Q(
    "q7_active_nations",
    (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .filter(col("n_orders") >= 50)
        .orderBy("c_nationkey"),
    Some("""select c_nationkey, count(*) as n_orders,
      round(sum(o_totalprice), 2) + 0.0 as revenue
    from orders join customer on o_custkey = c_custkey
    group by c_nationkey
    having count(*) >= 50
    order by c_nationkey"""),
    "P8: HAVING on aggregate")

  /** O3/O4: global top-N sort-limit (TakeOrderedAndProject — no full sort
    * at scale, each partition keeps N then the driver merges).
    */
  val q8 = Q(
    "q8_top_orders",
    (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .limit(10),
    Some("""select o_orderkey, o_custkey, o_totalprice, o_orderstatus
    from orders
    order by o_totalprice desc, o_orderkey
    limit 10"""),
    "O3/O4: ordered limit / top-N")

  /** Set operators (§2.7 note): INTERSECT / EXCEPT / UNION ALL in one
    * tagged result.
    */
  val q9 = Q(
    "q9_set_ops",
    (s, dir) => {
      val building = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("k"))
      val bigSpenders = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("k")).distinct()
      building.intersect(bigSpenders).select(lit("both").as("tag"), col("k"))
        .unionAll(
          building.except(bigSpenders).select(lit("building_only").as("tag"), col("k")))
        .orderBy("tag", "k")
    },
    Some("""with building as (
      select c_custkey as k from customer where c_mktsegment = 'BUILDING'
    ), big as (
      select distinct o_custkey as k from orders where o_totalprice > 400000.0
    )
    select 'both' as tag, k from (select k from building intersect select k from big)
    union all
    select 'building_only' as tag, k from (select k from building except select k from big)
    order by tag, k"""),
    "set ops: INTERSECT / EXCEPT / UNION ALL")

  /** F1-F9 scalar zoo: surrogate key, string ops, abs/nullif/coalesce/case,
    * modular arithmetic — byte-parity of md5 surrogate keys with DuckDB.
    */
  val q10 = Q(
    "q10_scalar_zoo",
    (s, dir) =>
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .select(
          col("n_nationkey"),
          md5(concat_ws("-",
            coalesce(col("n_nationkey").cast("string"), lit("_null_")),
            coalesce(col("n_name"), lit("_null_")))).as("nation_key_md5"),
          upper(col("n_name")).as("name_upper"),
          lower(col("r_name")).as("region_lower"),
          length(col("n_name")).as("name_len"),
          substring(col("n_name"), 1, 3).as("name_prefix"),
          abs(col("n_nationkey") - 12).as("dist_from_12"),
          coalesce(nullif(col("n_regionkey"), lit(2)), lit(-1)).as("region_or_neg"),
          when(col("n_nationkey") % 2 === 0, "even").otherwise("odd").as("parity"),
          concat(col("n_name"), lit("/"), col("r_name")).as("path"),
          greatest(col("n_nationkey"), col("n_regionkey") * 5, lit(3))
            .as("greatest_key"),
          least(col("n_nationkey"), col("n_regionkey") * 5, lit(3)).as("least_key"))
        .orderBy("n_nationkey"),
    Some("""select n_nationkey,
      md5(concat_ws('-', coalesce(cast(n_nationkey as varchar), '_null_'),
                         coalesce(n_name, '_null_'))) as nation_key_md5,
      upper(n_name) as name_upper,
      lower(r_name) as region_lower,
      length(n_name) as name_len,
      substr(n_name, 1, 3) as name_prefix,
      abs(n_nationkey - 12) as dist_from_12,
      coalesce(nullif(n_regionkey, 2), -1) as region_or_neg,
      case when n_nationkey % 2 = 0 then 'even' else 'odd' end as parity,
      concat(n_name, '/', r_name) as path,
      greatest(n_nationkey, n_regionkey * 5, 3) as greatest_key,
      least(n_nationkey, n_regionkey * 5, 3) as least_key
    from nation join region on n_regionkey = r_regionkey
    order by n_nationkey"""),
    "F1-F9/O6: scalar function zoo incl. dbt-style md5 surrogate key, greatest/least")

  /** Semi/anti joins (§2.4 anti-join note): suppliers with/without parts in
    * a price band, as tagged counts.
    */
  val q11 = Q(
    "q11_semi_anti",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val orderKeys = Tables.orders(s, dir)
        .filter(col("o_totalprice") > 300000.0)
        .select(col("o_custkey"))
      val withO = cust.join(orderKeys, col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n")).select(lit("with_big_order").as("tag"), col("n"))
      val withoutO = cust.join(orderKeys, col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n")).select(lit("without_big_order").as("tag"), col("n"))
      withO.unionAll(withoutO).orderBy("tag")
    },
    Some("""select 'with_big_order' as tag, count(*) as n from customer
      where c_custkey in (select o_custkey from orders where o_totalprice > 300000.0)
    union all
    select 'without_big_order' as tag, count(*) as n from customer
      where c_custkey not in (select o_custkey from orders where o_totalprice > 300000.0)
    order by tag"""),
    "J: left-semi / left-anti joins")

  /** A9: DISTINCT + exact count-distinct per group. */
  val q12 = Q(
    "q12_distinct_users",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy("event_type"),
    Some("""select event_type, count(distinct user_id) as n_users, count(*) as n_events
    from events group by event_type order by event_type"""),
    "A9: distinct aggregation")

  /** F9/date ops: per-month order rollup with string-formatted bucket. */
  val q13 = Q(
    "q13_monthly_orders",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
        .orderBy("month"),
    Some("""select strftime(o_orderdate, '%Y-%m') as month,
      count(*) as n_orders,
      round(sum(o_totalprice), 2) + 0.0 as revenue
    from orders group by 1 order by month"""),
    "date bucketing + rollup by month")

  /** W6: rank over an aggregate with rounded, deterministic sort key. */
  val q14 = Q(
    "q14_top_customers_per_nation",
    (s, dir) => {
      val totals = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "c_custkey")
        .agg(round(sum("o_totalprice"), 2).as("total"))
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("total").desc, col("c_custkey"))
      totals.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy("c_nationkey", "rnk")
    },
    Some("""select * from (
      select c_nationkey, c_custkey, total,
        row_number() over (partition by c_nationkey order by total desc, c_custkey) as rnk
      from (
        select c_nationkey, c_custkey, round(sum(o_totalprice), 2) + 0.0 as total
        from orders join customer on o_custkey = c_custkey
        group by c_nationkey, c_custkey) t
    ) ranked
    where rnk <= 3
    order by c_nationkey, rnk"""),
    "W6: row_number over group-by result")

  /** Grouping sets: ROLLUP over (source, lang) — subtotal rows carry null
    * keys, coalesced to '(all)' on both sides for deterministic compare.
    */
  val q15 = Q(
    "q15_rollup",
    (s, dir) =>
      Tables.documents(s, dir)
        .rollup("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("n_chars"), 4).as("avg_chars"))
        .select(
          coalesce(col("source"), lit("(all)")).as("source"),
          coalesce(col("lang"), lit("(all)")).as("lang"),
          col("n_docs"), col("avg_chars"))
        .orderBy("source", "lang"),
    Some("""select coalesce(source, '(all)') as source,
      coalesce(lang, '(all)') as lang,
      count(*) as n_docs,
      round(avg(n_chars), 4) + 0.0 as avg_chars
    from documents
    group by rollup (source, lang)
    order by source, lang"""),
    "grouping sets: ROLLUP with subtotal rows")

  /** JSON extraction from the events props column — metadata parsing, a
    * staple of training-data pipelines.
    */
  val q16 = Q(
    "q16_json_props",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          round(avg("k"), 6).as("avg_k"),
          min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("event_type"),
    Some("""select event_type, count(*) as n,
      round(avg(k), 6) + 0.0 as avg_k, min(k) as min_k, max(k) as max_k
    from (select event_type, cast(json_extract(props, '$.k') as int) as k
          from events) t
    group by event_type order by event_type"""),
    "JSON metadata extraction + rollup")

  /** Correlated subqueries — scalar count per outer row + correlated
    * EXISTS. Expressed in SQL so Catalyst's decorrelation rewrites do the
    * work (scalar-subquery → left outer aggregate join, EXISTS → left
    * semi join): the declarative form a reference user would write, planned
    * as joins that scale.
    */
  val q17 = Q(
    "q17_correlated_subqueries",
    (s, dir) => {
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql("""select c.c_custkey, c.c_name,
        (select count(*) from orders o where o.o_custkey = c.c_custkey) as n_orders
        from customer c
        where exists (
          select 1 from orders o
          where o.o_custkey = c.c_custkey and o.o_totalprice > 100000)
        order by c.c_custkey""")
    },
    Some("""select c.c_custkey, c.c_name,
      (select count(*) from orders o where o.o_custkey = c.c_custkey) as n_orders
    from customer c
    where exists (
      select 1 from orders o
      where o.o_custkey = c.c_custkey and o.o_totalprice > 100000)
    order by c.c_custkey"""),
    "correlated scalar + EXISTS subqueries (Catalyst decorrelation)")

  /** Pivot: long→wide restatement of per-user event values — the inverse of
    * q16-style rollups and the m1 `stack`. Explicit pivot values keep the
    * output schema deterministic (and let Catalyst plan a single aggregate
    * instead of a distinct-values pre-pass).
    */
  val q18 = Q(
    "q18_pivot",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "error"))
        .agg(round(sum("value"), 2))
        .orderBy("user_id"),
    Some("""select user_id,
      round(sum(case when event_type = 'click' then value end), 2) + 0.0 as click,
      round(sum(case when event_type = 'view' then value end), 2) + 0.0 as view,
      round(sum(case when event_type = 'purchase' then value end), 2) + 0.0 as purchase,
      round(sum(case when event_type = 'error' then value end), 2) + 0.0 as error
    from events group by user_id order by user_id"""),
    "pivot long→wide with explicit value list")

  /** Interval join: concurrent activity per session — each 12 h-gap session
    * (q5's definition) counts OTHER users' events inside its [start, end]
    * span. A naive `between` join is a nested-loop product; this goes
    * through [[graft.ops.RangeJoin.pointInInterval]] (6 h bucketization →
    * equi shuffle join + residual), the plan shape that survives at scale.
    */
  val q19 = Q(
    "q19_interval_join",
    (s, dir) => {
      val events = Tables.events(s, dir)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapNs = 12L * 3600 * 1000000000L
      val sessions = events
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull || col("ts") - col("prev_ts") > gapNs, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_id").cast("long").as("session_id"))
        .agg(min("ts").as("start_ts"), max("ts").as("end_ts"))
      val points = events.select(
        col("ts"), col("user_id").as("p_user"), col("value"))
      graft.ops.RangeJoin.pointInInterval(points, sessions,
          "ts", "start_ts", "end_ts", bucketWidth = 6L * 3600 * 1000000000L)
        .filter(col("p_user") =!= col("user_id"))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_concurrent"),
          round(sum("value"), 2).as("concurrent_value"))
        .orderBy("user_id", "session_id")
    },
    Some("""with lagged as (
      select user_id, event_id, ts, value,
        case when lag(epoch_ns(ts)) over w is null
               or epoch_ns(ts) - lag(epoch_ns(ts)) over w > 43200000000000
             then 1 else 0 end as is_new
      from events
      window w as (partition by user_id order by ts, event_id)
    ), numbered as (
      select *, sum(is_new) over (partition by user_id order by ts, event_id
        rows between unbounded preceding and current row) as session_id
      from lagged
    ), sessions as (
      select user_id, cast(session_id as bigint) as session_id,
        min(epoch_ns(ts)) as start_ts, max(epoch_ns(ts)) as end_ts
      from numbered group by user_id, session_id
    ), points as (
      select epoch_ns(ts) as p_ns, user_id as p_user, value from events
    )
    select s.user_id, s.session_id,
      count(*) as n_concurrent,
      round(sum(p.value), 2) + 0.0 as concurrent_value
    from sessions s
    join points p on p.p_ns between s.start_ts and s.end_ts
                 and p.p_user != s.user_id
    group by s.user_id, s.session_id
    order by s.user_id, s.session_id"""),
    "interval join: bucketized point-in-interval (no nested-loop product)")

  /** As-of join: each event annotated with the user's most recent purchase
    * at-or-before it (id, value, nanoseconds of staleness). Runs through
    * [[graft.ops.RangeJoin.asOf]] — union-tag + running window, ONE shuffle
    * and zero join operators — and is hash-checked against DuckDB's native
    * `ASOF LEFT JOIN`.
    */
  val q20 = Q(
    "q20_asof_join",
    (s, dir) => {
      val events = Tables.events(s, dir)
      val purchases = events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          col("event_id").as("purchase_event_id"),
          col("value").as("purchase_value"))
      graft.ops.RangeJoin.asOf(
          events.select("event_id", "user_id", "ts"), purchases,
          key = "user_id", leftTs = "ts", rightTs = "ts")
        .select(
          col("event_id"), col("user_id"),
          col("asof.purchase_event_id").as("last_purchase_id"),
          // Microsecond floor on both sides: DuckDB reads the nano
          // timestamps at its native microsecond precision.
          (expr("ts div 1000") - expr("asof.ts div 1000"))
            .as("us_since_purchase"),
          col("asof.purchase_value").as("purchase_value"))
        .orderBy("event_id")
    },
    Some("""select e.event_id, e.user_id,
      p.event_id as last_purchase_id,
      epoch_us(e.ts) - epoch_us(p.ts) as us_since_purchase,
      p.value as purchase_value
    from events e
    asof left join (
      select user_id, ts, event_id, value from events
      where event_type = 'purchase') p
      on e.user_id = p.user_id and e.ts >= p.ts
    order by e.event_id"""),
    "as-of join: latest-prior purchase per event (union-tag window form)")

  /** CUBE with GROUPING flags: all four aggregation levels over
    * (status, priority) in one pass, subtotal rows disambiguated by the
    * grouping bits rather than q15's sentinel strings. Catalyst plans one
    * Expand + one hash aggregate — grouping-set fan-out happens map-side,
    * not as four scans.
    */
  val q21 = Q(
    "q21_cube",
    (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping("o_orderstatus").cast("int").as("g_status"),
          grouping("o_orderpriority").cast("int").as("g_prio"),
          count(lit(1)).as("n_orders"),
          graft.Norm.rz(sum("o_totalprice"), 2).as("total_price"))
        .orderBy(col("g_status"), col("g_prio"),
          coalesce(col("o_orderstatus"), lit("")),
          coalesce(col("o_orderpriority"), lit(""))),
    Some("""select o_orderstatus, o_orderpriority,
      cast(grouping(o_orderstatus) as int) as g_status,
      cast(grouping(o_orderpriority) as int) as g_prio,
      count(*) as n_orders,
      round(sum(o_totalprice), 2) + 0.0 as total_price
    from orders
    group by cube (o_orderstatus, o_orderpriority)
    order by g_status, g_prio,
      coalesce(o_orderstatus, ''), coalesce(o_orderpriority, '')"""),
    "grouping sets: CUBE with grouping() disambiguation bits")

  /** Salted two-stage aggregation — the skew pattern for hot grouping keys
    * at 100 TB: events hash-salt into 32 subkeys, partial (count, sum)
    * aggregates shuffle on (key, salt) so one viral key spreads over 32
    * reducers, and a second tiny aggregate folds the partials. The result
    * is EXACTLY the plain group-by (verified by the oracle running the
    * direct form) — only the shuffle distribution changes. For avg the
    * partials must be (sum, count), never partial averages.
    */
  val q22 = Q(
    "q22_salted_skew_agg",
    (s, dir) => {
      val partial = Tables.events(s, dir)
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(32L)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("cnt"), sum("value").as("sv"))
      partial.groupBy("event_type")
        .agg(
          sum("cnt").as("n_events"),
          graft.Norm.rz(sum("sv"), 2).as("total_value"),
          graft.Norm.rz(sum("sv") / sum("cnt"), 6).as("avg_value"))
        .orderBy("event_type")
    },
    Some("""select event_type,
      count(*) as n_events,
      round(sum(value), 2) + 0.0 as total_value,
      round(sum(value) / count(*), 6) + 0.0 as avg_value
    from events group by event_type order by event_type"""),
    "skew: salted two-stage aggregation, result identical to the direct group-by")

  /** Ordered funnel analysis over the event stream: per user, the first
    * `view`, the first `click` at-or-after that view, the first `purchase`
    * at-or-after that click; users roll up into the deepest stage reached
    * plus the mean view→purchase latency of converters. Scale shape: the
    * three dependent "first event after X" lookups are chained
    * MIN-over-user windows — all on the SAME partition key, so Catalyst
    * plans ONE user_id shuffle for the whole chain, and the per-user
    * collapse reuses that partitioning; only the 4-row stage rollup
    * re-shuffles.
    */
  val q23 = Q(
    "q23_funnel",
    (s, dir) => {
      val w = Window.partitionBy("user_id")
      val perEvent = Tables.events(s, dir)
        .withColumn("v",
          min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("c",
          min(when(col("event_type") === "click" && col("ts") >= col("v"),
            col("ts"))).over(w))
        .withColumn("p",
          min(when(col("event_type") === "purchase" && col("ts") >= col("c"),
            col("ts"))).over(w))
      val perUser = perEvent.groupBy("user_id")
        .agg(max("v").as("v"), max("c").as("c"), max("p").as("p"))
        .withColumn("funnel_stage",
          when(col("p").isNotNull, 3)
            .when(col("c").isNotNull, 2)
            .when(col("v").isNotNull, 1)
            .otherwise(0))
      perUser.groupBy("funnel_stage")
        .agg(
          count(lit(1)).as("n_users"),
          graft.Norm.rz(avg((col("p") - col("v")) / 1e9), 6)
            .as("avg_seconds_to_purchase"))
        .orderBy("funnel_stage")
    },
    Some("""with e1 as (
      select user_id, ts, event_type,
        min(case when event_type = 'view' then epoch_ns(ts) end)
          over (partition by user_id) as v
      from events
    ), e2 as (
      select *, min(case when event_type = 'click' and epoch_ns(ts) >= v
          then epoch_ns(ts) end) over (partition by user_id) as c
      from e1
    ), e3 as (
      select *, min(case when event_type = 'purchase' and epoch_ns(ts) >= c
          then epoch_ns(ts) end) over (partition by user_id) as p
      from e2
    ), per_user as (
      select user_id, max(v) as v, max(c) as c, max(p) as p
      from e3 group by 1
    )
    select case when p is not null then 3
                when c is not null then 2
                when v is not null then 1
                else 0 end as funnel_stage,
      count(*) as n_users,
      round(avg((p - v) / 1e9), 6) + 0.0 as avg_seconds_to_purchase
    from per_user
    group by 1 order by 1"""),
    "funnel: chained first-event-after windows on one user shuffle + stage rollup")

  /** Exact interpolated percentiles — the sort-based aggregate (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, identical linear
    * interpolation, so the hash match is bitwise). The multi-quantile
    * array form is exercised via the p75 element. The 100 TB path for
    * quantiles is `percentile_approx` (t-digest, spec-verified in
    * `ApproxSpec` at ≤5% error); this query is the exact face a report
    * runs at reduced scale.
    */
  val q24 = Q(
    "q24_percentiles",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          graft.Norm.rz(expr("percentile(l_extendedprice, 0.5)"), 4)
            .as("median_price"),
          graft.Norm.rz(expr("percentile(l_extendedprice, array(0.25, 0.75))[1]"), 4)
            .as("p75_price"),
          graft.Norm.rz(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag"),
    Some("""select l_returnflag,
      round(quantile_cont(l_extendedprice, 0.5), 4) + 0.0 as median_price,
      round(quantile_cont(l_extendedprice, 0.75), 4) + 0.0 as p75_price,
      round(quantile_cont(l_quantity, 0.9), 4) + 0.0 as p90_qty,
      count(*) as n
    from lineitem group by 1 order by 1"""),
    "exact interpolated percentiles (median/p75/p90) per group")

  /** Full outer join — the one join type the registry didn't pin: customers
    * with no orders AND order-side groups with no customer row survive, with
    * null-side accounting. Same equi-key shuffle shape as an inner join (one
    * exchange per side, null rows emitted from unmatched hash buckets).
    */
  val q25 = Q(
    "q25_full_outer",
    (s, dir) => {
      val bigSpenders = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(graft.Norm.rz(sum("o_totalprice"), 2).as("total_spent"))
        .filter(col("total_spent") > 400000)
      Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
        .join(bigSpenders, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"),
          col("total_spent"),
          col("c_custkey").isNull.as("customer_missing"),
          col("o_custkey").isNull.as("spend_missing"))
        .orderBy("custkey")
    },
    Some("""with spend as (
      select o_custkey, round(sum(o_totalprice), 2) + 0.0 as total_spent
      from orders group by 1
      having round(sum(o_totalprice), 2) + 0.0 > 400000
    ), cust as (
      select c_custkey, c_name from customer where c_mktsegment = 'BUILDING'
    )
    select coalesce(c.c_custkey, s.o_custkey) as custkey,
      c.c_name,
      s.total_spent,
      c.c_custkey is null as customer_missing,
      s.o_custkey is null as spend_missing
    from cust c full outer join spend s on c.c_custkey = s.o_custkey
    order by custkey"""),
    "full outer join with null-side accounting on both sides")

  /** Value-based window frame (RANGE BETWEEN): per-user rolling 1-hour
    * event count and value sum over the nanosecond event-time axis — the
    * sliding-window shape `rowsBetween` can't express when events are
    * irregularly spaced. One shuffle on the user partition; the frame is
    * resolved by ordering value, not row position.
    */
  val q26 = Q(
    "q26_range_frame",
    (s, dir) => {
      // Microsecond axis on BOTH engines: DuckDB truncates TIMESTAMP(NANOS)
      // to µs at parquet read, so the frame must be resolved at µs or
      // boundary rows could land on different sides of the 1-hour edge.
      // Integer `div`, NOT `/`: at ~1.7e18 ns the implicit long→double of
      // floating division loses the low ~8 bits and flips the last µs digit.
      val hourUs = 3600L * 1000000L
      val w = Window.partitionBy("user_id").orderBy("ts_us")
        .rangeBetween(-hourUs, 0)
      Tables.events(s, dir)
        .withColumn("ts_us", expr("ts div 1000"))
        .select(
          col("event_id"), col("user_id"), col("ts_us"),
          count(lit(1)).over(w).as("events_last_hour"),
          graft.Norm.rz(sum("value").over(w), 2).as("value_last_hour"))
        .orderBy("event_id")
    },
    Some("""select event_id, user_id, epoch_us(ts) as ts_us,
      count(*) over w as events_last_hour,
      round(sum(value) over w, 2) + 0.0 as value_last_hour
    from events
    window w as (partition by user_id order by epoch_us(ts)
      range between 3600000000 preceding and current row)
    order by event_id"""),
    "value-range window frame: rolling 1-hour per-user aggregates on event time")

  /** W-family completion: the navigation / distribution window functions
    * not otherwise exercised — first_value, last_value + nth_value over an
    * explicit full frame (the default frame stops at CURRENT ROW, the
    * classic last_value footgun), lead, dense_rank, cume_dist. Total
    * order inside each partition via the (date, key) tie-break so both
    * engines rank identically. One shuffle: every function shares the one
    * per-customer sort.
    */
  val q27 = Q(
    "q27_window_nav",
    (s, dir) => {
      val byDate = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = byDate.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .filter(col("o_custkey") < 200)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first_value(col("o_orderkey")).over(byDate).as("first_order"),
          last_value(col("o_orderkey")).over(full).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(full).as("second_order"),
          lead(col("o_orderkey"), 1).over(byDate).as("next_order"),
          dense_rank().over(byDate).as("rk"),
          round(cume_dist().over(byDate), 6).as("cd"))
        .orderBy("o_custkey", "o_orderkey")
    },
    Some("""select o_custkey, o_orderkey,
      first_value(o_orderkey) over w as first_order,
      last_value(o_orderkey) over wf as last_order,
      nth_value(o_orderkey, 2) over wf as second_order,
      lead(o_orderkey, 1) over w as next_order,
      dense_rank() over w as rk,
      round(cume_dist() over w, 6) + 0.0 as cd
    from orders
    where o_custkey < 200
    window w as (partition by o_custkey order by o_orderdate, o_orderkey),
      wf as (partition by o_custkey order by o_orderdate, o_orderkey
        rows between unbounded preceding and unbounded following)
    order by o_custkey, o_orderkey"""),
    "window navigation: first/last/nth_value, lead, dense_rank, cume_dist")

  /** Data profiling — the inventory pass a warehouse runs before modeling:
    * per column, row/null/distinct counts and min/max (stringified on a
    * type-stable path: bigint / varchar / date), one output row per
    * column. Shape: one single-distinct aggregate per column, unioned —
    * NOT one aggregate with four `count(distinct ...)`s, which Catalyst
    * plans as an Expand that multiplies every input row by the number of
    * distinct columns before the shuffle (measured 7 s vs ~1 s at sf0.1).
    * Each leg scans only its own column (pruned parquet read) with
    * map-side partial aggregation.
    */
  val q28 = Q(
    "q28_profile",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      def prof(c: String, v: Column) =
        li.agg(
          count(lit(1)).cast("long").as("n_rows"),
          sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(v).cast("string").as("min_value"),
          max(v).cast("string").as("max_value"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      prof("l_orderkey", col("l_orderkey"))
        .unionAll(prof("l_linenumber", col("l_linenumber")))
        .unionAll(prof("l_returnflag", col("l_returnflag")))
        .unionAll(prof("l_shipdate", col("l_shipdate").cast("date")))
        .orderBy("column_name")
    },
    Some("""with src as (select * from lineitem)
    select 'l_orderkey' as column_name, count(*) as n_rows,
      cast(sum(case when l_orderkey is null then 1 else 0 end) as bigint) as n_nulls,
      count(distinct l_orderkey) as n_distinct,
      cast(min(l_orderkey) as varchar) as min_value,
      cast(max(l_orderkey) as varchar) as max_value
    from src
    union all
    select 'l_linenumber', count(*),
      cast(sum(case when l_linenumber is null then 1 else 0 end) as bigint),
      count(distinct l_linenumber),
      cast(min(l_linenumber) as varchar), cast(max(l_linenumber) as varchar)
    from src
    union all
    select 'l_returnflag', count(*),
      cast(sum(case when l_returnflag is null then 1 else 0 end) as bigint),
      count(distinct l_returnflag),
      cast(min(l_returnflag) as varchar), cast(max(l_returnflag) as varchar)
    from src
    union all
    select 'l_shipdate', count(*),
      cast(sum(case when l_shipdate is null then 1 else 0 end) as bigint),
      count(distinct l_shipdate),
      cast(min(cast(l_shipdate as date)) as varchar),
      cast(max(cast(l_shipdate as date)) as varchar)
    from src
    order by column_name"""),
    "data profiling: per-column null/distinct/min/max in one pass + unpivot")

  /** Type-2 slowly-changing-dimension merge — the MERGE INTO a warehouse
    * runs when a dimension update batch lands: changed rows get their
    * current version closed (valid_to stamped, is_current=false) plus a
    * new open version; unchanged rows pass through. Built from one
    * broadcast semi/anti pair + a union: the update batch is deltas —
    * small by nature — so the 100 TB dimension is never shuffled, only
    * scanned twice (closed + unchanged legs; one scan with a conditional
    * explode would trade that for a wider row — not worth it while the
    * scans stay pruned). The update batch here is derived
    * deterministically (hash bucket < 20 gets a balance adjustment) so
    * the merge is hash-verifiable.
    */
  val q29 = Q(
    "q29_scd2_merge",
    (s, dir) => {
      val cust = Tables.customer(s, dir)
      val bucket = (conv(substring(md5(col("c_custkey").cast("string")), 1, 6), 16, 10)
        .cast("long") % 100)
      val updates = cust.filter(bucket < 20)
        .select(col("c_custkey"), (col("c_acctbal") + 100.0).as("new_acctbal"))
      val d0 = to_date(lit("2024-01-01"))
      val d1 = to_date(lit("2024-06-01"))
      val changed = updates.select("c_custkey")
      val noDate = lit(null).cast("date")
      val closed = cust.join(broadcast(changed), Seq("c_custkey"))
        .select(col("c_custkey"), col("c_acctbal"), d0.as("valid_from"),
          d1.as("valid_to"), lit(false).as("is_current"))
      val unchanged = cust.join(broadcast(changed), Seq("c_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"), d0.as("valid_from"),
          noDate.as("valid_to"), lit(true).as("is_current"))
      val fresh = updates
        .select(col("c_custkey"), col("new_acctbal").as("c_acctbal"),
          d1.as("valid_from"), noDate.as("valid_to"), lit(true).as("is_current"))
      closed.unionByName(unchanged).unionByName(fresh)
        .orderBy("c_custkey", "valid_from")
    },
    Some("""with upd as (
      select c_custkey, c_acctbal + 100.0 as new_acctbal
      from customer
      where cast(concat('0x', substr(md5(cast(c_custkey as varchar)), 1, 6)) as bigint) % 100 < 20
    )
    select c.c_custkey, c.c_acctbal, date '2024-01-01' as valid_from,
      date '2024-06-01' as valid_to, false as is_current
    from customer c where exists (select 1 from upd u where u.c_custkey = c.c_custkey)
    union all
    select c.c_custkey, c.c_acctbal, date '2024-01-01', null, true
    from customer c where not exists (select 1 from upd u where u.c_custkey = c.c_custkey)
    union all
    select u.c_custkey, u.new_acctbal, date '2024-06-01', null, true from upd u
    order by c_custkey, valid_from"""),
    "SCD2 merge: close changed versions, open new ones, broadcast delta batch")

  /** Table reconciliation: locate where two snapshots of a table diverge
    * WITHOUT comparing rows — per-bucket order-independent checksums
    * (bit_xor of a portable row hash), compared bucket-by-bucket. At
    * 100 TB this is how replicas are audited: each side reduces to
    * |buckets| rows map-side (xor is commutative — partial aggregation
    * does almost all the work before the one tiny shuffle), and only
    * diverging buckets are re-read row-level afterwards. The "replica" is
    * the same orders table with a deterministic 0.2% balance corruption
    * so the diff is hash-verifiable; the row hash is md5-derived (engine-
    * portable) over integer-exact cents — never a stringified double.
    */
  val q30 = Q(
    "q30_table_diff",
    (s, dir) => {
      val base = Tables.orders(s, dir).select(
        col("o_orderkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val corrupt = (conv(substring(md5(col("o_orderkey").cast("string")), 1, 6), 16, 10)
        .cast("long") % 1000) < 2
      val replica = base.withColumn("cents",
        when(corrupt, col("cents") + 100L).otherwise(col("cents")))
      def buckets(df: DataFrame) = df
        .select((col("o_orderkey") % 256).as("bucket"),
          conv(substring(md5(concat_ws("|",
            col("o_orderkey").cast("string"), col("cents").cast("string"))), 1, 15), 16, 10)
            .cast("long").as("rh"))
        .groupBy("bucket")
        .agg(expr("bit_xor(rh)").as("checksum"), count(lit(1)).as("n_rows"))
      buckets(base).as("a")
        .join(buckets(replica).as("b"), Seq("bucket"), "full_outer")
        .filter(!(col("a.checksum") <=> col("b.checksum")))
        .select(col("bucket"),
          col("a.n_rows").as("n_rows_a"), col("b.n_rows").as("n_rows_b"))
        .orderBy("bucket")
    },
    Some("""with base as (
      select o_orderkey, cast(round(o_totalprice * 100) as bigint) as cents
      from orders
    ), replica as (
      select o_orderkey,
        case when cast(concat('0x', substr(md5(cast(o_orderkey as varchar)), 1, 6)) as bigint) % 1000 < 2
          then cents + 100 else cents end as cents
      from base
    ), ca as (
      select o_orderkey % 256 as bucket,
        bit_xor(cast(concat('0x', substr(md5(concat(cast(o_orderkey as varchar), '|', cast(cents as varchar))), 1, 15)) as bigint)) as checksum,
        count(*) as n_rows
      from base group by 1
    ), cb as (
      select o_orderkey % 256 as bucket,
        bit_xor(cast(concat('0x', substr(md5(concat(cast(o_orderkey as varchar), '|', cast(cents as varchar))), 1, 15)) as bigint)) as checksum,
        count(*) as n_rows
      from replica group by 1
    )
    select coalesce(ca.bucket, cb.bucket) as bucket,
      ca.n_rows as n_rows_a, cb.n_rows as n_rows_b
    from ca full outer join cb on ca.bucket = cb.bucket
    where ca.checksum is distinct from cb.checksum
    order by bucket"""),
    "table diff: per-bucket xor checksums locate divergence with a |buckets|-row exchange")

  /** Incremental materialized-view maintenance: a per-customer order
    * rollup kept current by MERGING the stored aggregate with the delta
    * batch's partial aggregate — never rescanning history. Algebraic
    * aggregates only (count and an integer-exact cents sum; avg derived
    * at read time), because algebraic merge is what makes the maintenance
    * exact: sum/count partials combine associatively, so
    * merge(agg(old), agg(delta)) ≡ agg(old ∪ delta) — which is precisely
    * the equivalence the oracle checks by recomputing the rollup from ALL
    * orders. At 100 TB the "base" leg is a stored MV read, and each
    * refresh costs one delta scan + a |customers|-row merge. Sums stay in
    * bigint cents: double partials would merge in a different order than
    * the oracle's single pass and drift by ulps.
    */
  val q31 = Q(
    "q31_incremental_agg",
    (s, dir) => {
      val orders = Tables.orders(s, dir).select(
        col("o_custkey"),
        col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val cutoff = lit("1997-01-01").cast("date")
      def partial(df: DataFrame) = df.groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum("cents").as("sum_cents"))
      val base = partial(orders.filter(col("o_orderdate") < cutoff))
      val delta = partial(orders.filter(col("o_orderdate") >= cutoff))
      base.unionByName(delta)
        .groupBy("o_custkey")
        .agg(sum("n_orders").as("n_orders"), sum("sum_cents").as("sum_cents"))
        .withColumn("avg_price",
          round(col("sum_cents") / (col("n_orders") * 100.0), 6))
        .orderBy("o_custkey")
    },
    Some("""select o_custkey,
      count(*) as n_orders,
      cast(sum(cast(round(o_totalprice * 100) as bigint)) as bigint) as sum_cents,
      round(sum(cast(round(o_totalprice * 100) as bigint))
        / (count(*) * 100.0), 6) + 0.0 as avg_price
    from orders
    group by o_custkey
    order by o_custkey"""),
    "incremental MV maintenance: algebraic partial-agg merge == full recompute")

  /** Triangle counting on the frequent-co-purchase graph — the graph
    * analytics shape (market-basket edges → wedge join → closing join)
    * that stresses join explosion control. The support threshold
    * (co-occurrence in ≥2 orders) is the load-bearing scale decision:
    * random one-off co-occurrence makes the raw graph near-complete (49M
    * wedges at sf0.1, and degree-orientation barely helps on a
    * near-regular graph), while support pruning collapses it 5000× before
    * any quadratic step — prune-first beats clever-join-order here.
    * Wedges are rooted at the smallest-id endpoint so each triangle is
    * counted exactly once. All counts integer-exact.
    */
  val q32 = Q(
    "q32_triangle_count",
    (s, dir) => {
      val e = graft.ops.Graphs
        .coPurchaseEdges(Tables.lineitem(s, dir), minSupport = 2)
        .persist()
      graft.ops.Graphs.triangleStats(e)
    },
    Some("""with e as (
      select a.l_partkey as u, b.l_partkey as v
      from lineitem a join lineitem b
        on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
      group by 1, 2 having count(*) >= 2
    ), w as (
      select e1.u as a, e1.v as b, e2.v as c
      from e e1 join e e2 on e1.u = e2.u and e1.v < e2.v
    ), t as (
      select 1 from w join e on w.b = e.u and w.c = e.v
    )
    select (select count(*) from e) as n_edges,
           (select count(*) from w) as n_wedges,
           (select count(*) from t) as n_triangles"""),
    "triangle count: support-pruned co-purchase graph, wedge + closing joins")

  /** PageRank (3 fixed iterations, d=0.85) over the same support-pruned
    * co-purchase graph as q32, symmetrized. Each iteration is one
    * join-and-reaggregate on the edge list — the canonical BSP step that
    * scales by partitioning on node id; with a fixed iteration count the
    * lineage stays bounded (the unbounded-iteration variant with lineage
    * truncation lives in `ops.Components`). The graph has no dangling
    * nodes by construction (symmetrized, every node has degree >= 1), so
    * no dangling-mass redistribution term is needed. Runs in scaled form
    * (P = pr·n, so P0 = 1.0 and the node count is only needed at the
    * output edge, attached by broadcast) — NO driver-side value at all;
    * the whole query is one lazy plan under a single action. Oracle: the
    * same three scaled iterations unrolled as chained CTEs; the unscaling
    * division and the rounding happen together at the output edge.
    */
  val q33 = Q(
    "q33_pagerank",
    (s, dir) => {
      val e0 = graft.ops.Graphs
        .coPurchaseEdges(Tables.lineitem(s, dir), minSupport = 2)
      graft.ops.Graphs.pagerank(e0, iters = 3, d = 0.85)
        .select(col("node"), round(col("pr"), 6).as("pr")).orderBy("node")
    },
    Some("""with e0 as (
      select a.l_partkey as u, b.l_partkey as v
      from lineitem a join lineitem b
        on a.l_orderkey = b.l_orderkey and a.l_partkey < b.l_partkey
      group by 1, 2 having count(*) >= 2
    ), edges as (
      select u, v from e0 union all select v, u from e0
    ), deg as (
      select u, cast(count(*) as double) as d from edges group by 1
    ), nn as (
      select cast(count(*) as double) as n from deg
    ), r0 as (
      select u as node, cast(1.0 as double) as p from deg
    ), c1 as (
      select e.v as node, sum(r.p / d.d) as m
      from r0 r join deg d on d.u = r.node join edges e on e.u = r.node
      group by 1
    ), r1 as (
      select node, (cast(1.0 as double) - cast(0.85 as double))
        + cast(0.85 as double) * m as p
      from c1
    ), c2 as (
      select e.v as node, sum(r.p / d.d) as m
      from r1 r join deg d on d.u = r.node join edges e on e.u = r.node
      group by 1
    ), r2 as (
      select node, (cast(1.0 as double) - cast(0.85 as double))
        + cast(0.85 as double) * m as p
      from c2
    ), c3 as (
      select e.v as node, sum(r.p / d.d) as m
      from r2 r join deg d on d.u = r.node join edges e on e.u = r.node
      group by 1
    ), r3 as (
      select node, (cast(1.0 as double) - cast(0.85 as double))
        + cast(0.85 as double) * m as p
      from c3
    )
    select node, round(p / nn.n, 6) + 0.0 as pr from r3, nn order by node"""),
    "pagerank: 3 BSP iterations over the support-pruned co-purchase graph")

  /** Salted replicated JOIN — the skew-join half of the playbook q22's
    * salted aggregation demonstrates for group-bys: when one join key is
    * hot enough to overflow a single shuffle partition, salt the fact side
    * with pmod(hash, R) and replicate the dimension side R× so each hot
    * key spreads over R partitions; every fact row still meets exactly one
    * replica of its dimension row, so the result is IDENTICAL to the plain
    * join — which is what the oracle (a plain join) hash-checks. At 100 TB
    * this is the manual fallback when AQE's skew split can't help (e.g.
    * the hot key's rows don't co-locate in splittable map outputs);
    * R multiplies only the small side's size, not the shuffle volume of
    * the fact side.
    */
  val q34 = Q(
    "q34_salted_join",
    (s, dir) => {
      val r = 8
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey"), col("l_extendedprice"))
        .withColumn("salt",
          pmod(xxhash64(col("l_orderkey"), col("l_partkey")), lit(r.toLong)))
      val pRep = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_brand"))
        .withColumn("salt",
          explode(sequence(lit(0L), lit(r.toLong - 1))))
      li.join(pRep,
          li("l_partkey") === pRep("p_partkey") && li("salt") === pRep("salt"))
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_items"),
          graft.Norm.rz(sum("l_extendedprice"), 2).as("revenue"))
        .orderBy("p_brand")
    },
    Some("""select p.p_brand, count(*) as n_items,
      round(sum(l.l_extendedprice), 2) + 0.0 as revenue
    from lineitem l join part p on p.p_partkey = l.l_partkey
    group by p.p_brand
    order by p.p_brand"""),
    "skew: salted replicated join, result identical to the plain join")

  /** Weekly retention-cohort matrix over the events stream — the product
    * analytics companion to q23's funnel: users are cohorted by their
    * first active week (integer week index from the raw nanosecond
    * timestamps, floored via the same pmod spelling as q38 so pre-1970
    * timestamps match DuckDB's `//` — `div` alone truncates toward zero;
    * no calendar/timezone surface to disagree on), and each
    * (cohort, week-offset) cell counts the cohort members still active.
    * The cohort assignment is a min-window over the distinct (user, week)
    * frame — no cohort agg+join round-trip — and after that frame every
    * user contributes exactly one row per (cohort, offset) cell, so the
    * matrix is a plain count (no count-distinct Expand) and the cohort
    * sizes ARE its offset-0 cells (every user is active in their own
    * first week), lifted per cohort by a max-window over the grouped
    * matrix — cells only, never a second pass or self-join over the
    * events subtree (a sizes-side branch would replay the whole scan:
    * the pushed offset-0 filter changes the subtree, so exchange reuse
    * can't dedupe it).
    */
  val q35 = Q(
    "q35_retention",
    (s, dir) => {
      val weeks = Tables.events(s, dir)
        .select(col("user_id"),
          expr("(ts - pmod(ts, 604800000000000)) div 604800000000000")
            .as("week"))
        .distinct()
      val matrix = weeks
        .withColumn("cohort_week",
          min("week").over(Window.partitionBy("user_id")))
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      matrix
        .withColumn("n_cohort",
          max(when(col("week_offset") === 0, col("n_active")))
            .over(Window.partitionBy("cohort_week")))
        .select(col("cohort_week"), col("week_offset"), col("n_active"),
          col("n_cohort"),
          graft.Norm.rz(col("n_active") / col("n_cohort").cast("double"), 4)
            .as("retention"))
        .orderBy("cohort_week", "week_offset")
    },
    Some("""with wk as (
      select distinct user_id, epoch_ns(ts) // 604800000000000 as week
      from events
    ), coh as (
      select user_id, week,
        min(week) over (partition by user_id) as cohort_week
      from wk
    ), m as (
      select cohort_week, week - cohort_week as week_offset,
        count(*) as n_active
      from coh group by 1, 2
    ), sized as (
      select cohort_week, week_offset, n_active,
        max(case when week_offset = 0 then n_active end)
          over (partition by cohort_week) as n_cohort
      from m
    )
    select cohort_week, week_offset, n_active, n_cohort,
      round(n_active / cast(n_cohort as double), 4) + 0.0 as retention
    from sized
    order by cohort_week, week_offset"""),
    "retention cohorts: first-week cohort × week-offset activity matrix")

  /** W1 variant with a VALUE-range frame: per-user trailing-hour event
    * count and value sum, the frame bounded by event TIME (`RANGE BETWEEN
    * 1h PRECEDING`) rather than a row count — the "activity in the last
    * hour" feature shape row frames can't express when event spacing is
    * irregular. One `user_id` shuffle; the frame is evaluated per row by a
    * sliding pass over the sorted partition, so cost is O(rows + frame
    * overlaps), never quadratic. Ties in `ts` are frame PEERS (included
    * for every peer row) on both engines, so no unique tie-break is needed
    * for determinism inside the frame; the output carries `event_id` for a
    * total result order.
    */
  val q36 = Q(
    "q36_range_window",
    (s, dir) => {
      val hourNs = 3600L * 1000000000L
      val w = Window.partitionBy("user_id").orderBy("ts")
        .rangeBetween(-hourNs, 0L)
      Tables.events(s, dir)
        .select(
          col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_trailing_hour"),
          round(sum("value").over(w), 6).as("sum_trailing_hour"))
        .orderBy("user_id", "event_id")
    },
    Some("""select user_id, event_id,
      count(*) over w as n_trailing_hour,
      round(sum(value) over w, 6) + 0.0 as sum_trailing_hour
    from events
    window w as (partition by user_id order by epoch_ns(ts)
      range between 3600000000000 preceding and current row)
    order by user_id, event_id"""),
    "W1 variant: time-valued RANGE frame (trailing-hour activity)")

  /** Z-order (Morton) multi-dimensional clustering — the data-layout
    * operator behind Delta/Iceberg `ZORDER BY`: interleaving the bits of
    * two dimension keys makes ranges of the combined key tight bounding
    * boxes in BOTH dimensions, so min/max file statistics prune scans with
    * predicates on either column. The query computes an 8+8-bit Morton key
    * over (user_id, ⌊value⌋ mod 256), buckets rows by the key's top 4 bits
    * (= fixed 2-bit prefix per dimension — NO global sort, no window: each
    * bucket is a static region of the space), and emits per-bucket row
    * counts + per-dimension min/max — exactly the pruning metadata a
    * layout-writer would stamp on each file. At 100 TB the bucket id
    * becomes the `repartitionByRange(morton)` write key; the key itself is
    * pure codegen'd integer bit-math, embarrassingly parallel, and the
    * stats are one hash aggregation. ZorderSpec asserts the locality
    * guarantee (per-bucket spans ≤ 64 in each dimension).
    */
  val q37 = Q(
    "q37_zorder_layout",
    (s, dir) => {
      def morton(x: Column, y: Column): Column =
        (0 until 8).map { i =>
          shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
            .bitwiseOR(
              shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
        }.reduce(_ bitwiseOR _)
      val keyed = Tables.events(s, dir)
        .select(
          (col("user_id") % 256).as("x"),
          (floor(col("value")).cast("long") % 256).as("y"))
        .withColumn("morton", morton(col("x"), col("y")))
      keyed
        .groupBy(shiftright(col("morton"), 12).as("bucket"))
        .agg(
          count(lit(1)).as("n_rows"),
          min("x").as("x_min"), max("x").as("x_max"),
          min("y").as("y_min"), max("y").as("y_max"),
          min("morton").as("morton_min"), max("morton").as("morton_max"))
        .orderBy("bucket")
    },
    Some {
      val mortonSql = (0 until 8).map { i =>
        s"(((x >> $i) & 1) << ${2 * i}) | (((y >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" | ")
      s"""with keyed as (
      select x, y, ($mortonSql) as morton
      from (select user_id % 256 as x,
              cast(floor(value) as bigint) % 256 as y
            from events) t
    )
    select morton >> 12 as bucket,
      count(*) as n_rows,
      min(x) as x_min, max(x) as x_max,
      min(y) as y_min, max(y) as y_max,
      min(morton) as morton_min, max(morton) as morton_max
    from keyed
    group by 1
    order by bucket"""
    },
    "layout: Z-order (Morton) clustering buckets + per-bucket pruning stats")

  /** Time-series gap-fill + resample — the regularization pass every
    * monitoring/feature pipeline runs before modeling: aggregate raw
    * events to a per-user DAILY grain, GENERATE the missing grid days
    * inside each user's observed span (`sequence` + explode — no existing
    * registry op creates rows; q20/q26/q36 only join or window existing
    * ones), and forward-fill the value over gaps with a flag preserving
    * which rows are synthetic. Scale shape: the raw corpus is touched by
    * ONE aggregate shuffle at the (user, day) grain; the grid explode
    * works on the |users| span table and rejoins at grid grain (output
    * rows, not event rows); the fill is one user-partitioned window. The
    * fill copies already-rounded daily values, so no summation-order ulp
    * can leak through a gap.
    */
  val q38 = Q(
    "q38_gapfill_resample",
    (s, dir) => {
      // Floor division in exact long arithmetic (pmod keeps the remainder
      // non-negative, so the subtraction lands on the grid multiple at or
      // below ts): matches DuckDB's `//` floor semantics for pre-1970
      // timestamps too, where `div` (truncate toward zero) would diverge.
      val day = expr(
        "(ts - pmod(ts, 86400000000000)) div 86400000000000").as("epoch_day")
      val daily = Tables.events(s, dir)
        .select(col("user_id"), day, col("value"))
        .groupBy("user_id", "epoch_day")
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("day_value"))
      val grid = daily.groupBy("user_id")
        .agg(min("epoch_day").as("d0"), max("epoch_day").as("d1"))
        .select(col("user_id"),
          explode(sequence(col("d0"), col("d1"))).as("epoch_day"))
      val w = Window.partitionBy("user_id").orderBy("epoch_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(daily, Seq("user_id", "epoch_day"), "left")
        .select(col("user_id"), col("epoch_day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          last(col("day_value"), ignoreNulls = true).over(w)
            .as("filled_value"),
          col("day_value").isNull.as("is_gap"))
        .orderBy("user_id", "epoch_day")
    },
    Some("""with ev as (
      select user_id, epoch_ns(ts) // 86400000000000 as d, value from events
    ), daily as (
      select user_id, d, cast(count(*) as bigint) as n_events,
        round(sum(value), 2) + 0.0 as day_value
      from ev group by 1, 2
    ), span as (
      select user_id, min(d) as d0, max(d) as d1 from daily group by 1
    ), grid as (
      select user_id, unnest(range(d0, d1 + 1)) as epoch_day from span
    ), j as (
      select g.user_id, g.epoch_day, daily.n_events, daily.day_value
      from grid g
      left join daily on g.user_id = daily.user_id and g.epoch_day = daily.d
    )
    select user_id, epoch_day,
      coalesce(n_events, 0) as n_events,
      last_value(day_value ignore nulls) over (
        partition by user_id order by epoch_day
        rows between unbounded preceding and current row) as filled_value,
      day_value is null as is_gap
    from j
    order by user_id, epoch_day"""),
    "time-series gap-fill: generate missing grid days + forward-fill")

  def all: Seq[Q] = Seq(
    q1, q2, q3, q4, q5, q6, q7, q8, q9, q10, q11, q12, q13, q14, q15, q16,
    q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28, q29, q30,
    q31, q32, q33, q34, q35, q36, q37, q38)
}
