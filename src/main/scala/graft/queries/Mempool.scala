package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** The flagship merge pipeline (SURVEY.md §3.1, cmd/merge/transactions.go:22-185)
  * re-expressed as one declarative Spark DAG over the events table playing
  * the raw-tx + sourcelog roles:
  *
  *   read → dedup earliest-wins (A1) → blacklist anti-join (J2) →
  *   sources-attach left join (J1, sources ordered by first receipt) →
  *   discard filter (F1) → global sort (O1)
  *
  * Two shuffles (dedup agg, sources agg share the user_id key) + broadcast
  * anti join + final range sort — the same shape the reference runs daily
  * over 1-2M txs, and the shape that scales horizontally at 100 TB.
  */
object Mempool {

  val defs: Map[String, QueryDef] = Map(
    "q_merge_pipeline" -> QueryDef.sql(
      "flagship §3.1 merge DAG: dedup + anti-join + sources-attach + filter + sort",
      """WITH sl AS (
        |  SELECT user_id, event_type, min(ts) AS first_ts
        |  FROM events GROUP BY user_id, event_type),
        |firsts AS (
        |  SELECT user_id, ts, event_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |    FROM events) WHERE rn = 1),
        |src AS (
        |  SELECT user_id,
        |    string_agg(event_type, ' ' ORDER BY first_ts, event_type) AS sources,
        |    COUNT(*) AS n_sources
        |  FROM sl GROUP BY user_id)
        |SELECT f.user_id, f.ts AS first_ts, f.event_id AS first_event,
        |  s.sources, s.n_sources
        |FROM firsts f
        |JOIN src s ON f.user_id = s.user_id
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM (
        |    SELECT user_id FROM events WHERE event_type = 'error'
        |    GROUP BY user_id HAVING COUNT(*) > 17) bl
        |  WHERE bl.user_id = f.user_id)
        |ORDER BY first_ts, f.user_id""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      // A2: per-(key, source) earliest receipt — the sourcelog dedup map.
      val sl = ev.groupBy("user_id", "event_type").agg(min("ts").as("first_ts"))
      // A1: earliest record wins for the payload (single hash agg, no window).
      val firsts = ev.groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"))).as("f"))
        .select(col("user_id"), col("f.ts").as("first_ts"), col("f.event_id").as("first_event"))
      // J1+O3: sources ordered by first receipt, space-joined like the
      // reference CSV layout (common/txsummary.go:104).
      val src = sl.groupBy("user_id")
        .agg(
          concat_ws(" ",
            transform(array_sort(collect_list(struct(col("first_ts"), col("event_type")))),
              x => x.getField("event_type"))).as("sources"),
          count(lit(1)).as("n_sources"))
      // J2: blacklist of keys with heavy 'error' traffic — data-dependent
      // and potentially O(users), so the broadcast hint is size-gated.
      val blacklist = ev.filter(col("event_type") === "error")
        .groupBy("user_id").agg(count(lit(1)).as("n_err"))
        .filter(col("n_err") > 17).select("user_id")
      firsts
        .join(graft.ops.Hints.broadcastIfSmall(blacklist), Seq("user_id"), "left_anti")
        .join(src, Seq("user_id"))
        .select("user_id", "first_ts", "first_event", "sources", "n_sources")
        .orderBy("first_ts", "user_id")
    }
  )
}
