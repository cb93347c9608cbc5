package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join inventory (SURVEY.md §2.5): sources-attach (J1), blacklist anti-join
  * (J2), enrichment join + delay quantiles (J3 + A15), source-pair
  * comparison self-join (J5), and a broadcast dim chain.
  *
  * All reference joins are hash-equi on the key; small sides are broadcast
  * so the big fact table never shuffles for them.
  */
object Joins {

  val defs: Map[String, QueryDef] = Map(

    // AS-OF join (differential-tested against DuckDB's native ASOF JOIN):
    // each purchase matched to the same user's latest click at ts <= its
    // own — the canonical time-series point-in-time join Spark lacks as a
    // built-in. Spark-first shape: tag both streams, union, and carry the
    // last click forward with an ignore-nulls window — ONE shuffle on the
    // join key, no range join, no per-key collect. Ties at equal ts sort
    // the click first (the inclusive >= bound); clicks are deduped to one
    // per (user, ts) so the match is unique and deterministic.
    "q_join_asof" -> QueryDef.sql(
      "as-of join: latest click at-or-before each purchase, union + window",
      """WITH clicks AS (
        |  SELECT user_id, ts, MAX(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |purch AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id,
        |  COALESCE(c.click_id, -1) AS click_id,
        |  CAST(COALESCE((epoch_us(p.ts) - epoch_us(c.ts)) // 1000, -1) AS BIGINT) AS delay_ms
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val tagged = clicks
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
          col("click_id"), lit(1).as("is_click"))
        .unionByName(purch.select(col("user_id"), col("ts"), col("event_id"),
          lit(null).cast("long").as("click_id"), lit(0).as("is_click")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("is_click").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("is_click") === 1, col("ts")), ignoreNulls = true).over(w))
        .filter(col("is_click") === 0)
        .select(col("event_id"), col("user_id"),
          coalesce(col("last_click_id"), lit(-1L)).as("click_id"),
          coalesce(expr("(unix_micros(ts) - unix_micros(last_click_ts)) div 1000"),
            lit(-1L)).as("delay_ms"))
    },

    // J1 sources-attach (cmd/merge/transactions.go:111-136): per key, the
    // matching detail rows sorted by (ts, id) projected into an ordered list.
    // Spark shape: aggregate detail side first (partial agg before the
    // shuffle), left-join onto the fact — string-joined for oracle parity.
    "q_join_sources_attach" -> QueryDef.sql(
      "J1: left join + collect_list/sort_array ordered sources attach",
      """SELECT o.o_orderkey, o.o_orderstatus, l.items, l.n_items FROM orders o
        |LEFT JOIN (
        |  SELECT l_orderkey,
        |    string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_shipdate, l_linenumber) AS items,
        |    COUNT(*) AS n_items
        |  FROM lineitem GROUP BY l_orderkey) l
        |ON o.o_orderkey = l.l_orderkey""".stripMargin) { (s, dir) =>
      val items = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(
          concat_ws(",",
            transform(
              array_sort(collect_list(struct(col("l_shipdate"), col("l_linenumber")))),
              x => x.getField("l_linenumber").cast("string"))).as("items"),
          count(lit(1)).as("n_items"))
      Tables.orders(s, dir)
        .join(items, col("o_orderkey") === col("l_orderkey"), "left")
        .select("o_orderkey", "o_orderstatus", "items", "n_items")
    },

    // J2 blacklist anti-join (common/txsfile.go:115-119): drop keys present
    // in the blacklist side. The distinct key set derives from a SCALING
    // table (urgent orders ≈ 1/5 of all orders), so the broadcast hint is
    // size-gated — SURVEY §2.5's own contract: broadcast if small, else
    // shuffle hash join.
    "q_join_anti" -> QueryDef.sql(
      "J2: left_anti (NOT EXISTS) blacklist join, size-gated broadcast build",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin) { (s, dir) =>
      val blacklist = Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      Tables.customer(s, dir)
        .join(graft.ops.Hints.broadcastIfSmall(blacklist),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // J3 inclusion-status enrichment join + P13 delay derivation + A15
    // quantiles (cmd/merge/inclusioncheck.go:92-117, README.md:134): join the
    // fact to its "block" dim, derive the delay, aggregate exact quantiles.
    "q_join_enrich_delay" -> QueryDef.sql(
      "J3+P13+A15: enrichment join, delay derivation, exact quantiles",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  round(avg(delay_days), 6) AS avg_delay,
        |  round(quantile_cont(delay_days, 0.5), 6) AS p50,
        |  round(quantile_cont(delay_days, 0.9), 6) AS p90,
        |  round(quantile_cont(delay_days, 0.99), 6) AS p99
        |FROM (
        |  SELECT o_orderpriority,
        |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS delay_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val joined = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
            .as("delay_days"))
      joined.groupBy("o_orderpriority").agg(
        count(lit(1)).as("n"),
        round(avg("delay_days"), 6).as("avg_delay"),
        round(expr("percentile(delay_days, 0.5)"), 6).as("p50"),
        round(expr("percentile(delay_days, 0.9)"), 6).as("p90"),
        round(expr("percentile(delay_days, 0.99)"), 6).as("p99"))
    },

    // J5 source-comparison pairs (common/types.go:32-60): latency of source A
    // vs source B per key — self-join of the per-(key,source) earliest-ts agg.
    "q_join_pairs" -> QueryDef.sql(
      "J5: self-join pairwise source latency comparison",
      """SELECT a.user_id, (epoch_us(b.first_ts) - epoch_us(a.first_ts)) // 1000 AS delta_ms
        |FROM (SELECT user_id, min(ts) AS first_ts FROM events WHERE event_type = 'click' GROUP BY user_id) a
        |JOIN (SELECT user_id, min(ts) AS first_ts FROM events WHERE event_type = 'view' GROUP BY user_id) b
        |ON a.user_id = b.user_id""".stripMargin) { (s, dir) =>
      val sl = Tables.events(s, dir)
      def firstSeen(src: String) = sl.filter(col("event_type") === src)
        .groupBy("user_id").agg(min("ts").as("first_ts"))
      val a = firstSeen("click").as("a")
      val b = firstSeen("view").as("b")
      a.join(b, col("a.user_id") === col("b.user_id"))
        .select(col("a.user_id").as("user_id"),
          expr("(unix_micros(b.first_ts) - unix_micros(a.first_ts)) div 1000").as("delta_ms"))
    },

    // J5+A15: the full source-comparison report the reference plumbs but
    // never consumes (common/types.go:32-60, common/analyzer.go:23,57):
    // per source-pair, distribution of first-receipt latency deltas.
    "q_source_latency" -> QueryDef.sql(
      "J5: per-pair latency delta percentiles between sources",
      """WITH sl AS (
        |  SELECT user_id, event_type, min(ts) AS first_ts
        |  FROM events GROUP BY user_id, event_type)
        |SELECT src_a, src_b, COUNT(*) AS n,
        |  round(quantile_cont(delta_ms, 0.5), 6) AS p50,
        |  round(quantile_cont(delta_ms, 0.9), 6) AS p90,
        |  CAST(SUM(CASE WHEN delta_ms < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a_first
        |FROM (
        |  SELECT a.event_type AS src_a, b.event_type AS src_b,
        |    (epoch_us(a.first_ts) - epoch_us(b.first_ts)) // 1000 AS delta_ms
        |  FROM sl a JOIN sl b ON a.user_id = b.user_id AND a.event_type < b.event_type)
        |GROUP BY src_a, src_b""".stripMargin) { (s, dir) =>
      val sl = Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(min("ts").as("first_ts"))
      val a = sl.select(col("user_id"), col("event_type").as("src_a"), col("first_ts").as("ts_a"))
      val b = sl.select(col("user_id"), col("event_type").as("src_b"), col("first_ts").as("ts_b"))
      a.join(b, Seq("user_id"))
        .filter(col("src_a") < col("src_b"))
        .withColumn("delta_ms",
          expr("(unix_micros(ts_a) - unix_micros(ts_b)) div 1000"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(delta_ms, 0.5)"), 6).as("p50"),
          round(expr("percentile(delta_ms, 0.9)"), 6).as("p90"),
          sum(when(col("delta_ms") < 0, 1).otherwise(0)).cast("long").as("n_a_first"))
    },

    // P5-style normalization via a broadcast dim chain: fact → nation →
    // region (the small-dim lookup the reference does with an in-memory map,
    // common/consts.go:27-42).
    "q_join_dim_chain" -> QueryDef.sql(
      "P5: broadcast dim-chain lookup join + rollup count",
      """SELECT r_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(DecimalType(18, 4))).cast("double").as("sum_bal"))
    }
  )
}
