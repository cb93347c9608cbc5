package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core operator inventory: filters (SURVEY.md §2.3), dedup + aggregation
  * (§2.4), sorts/limits/union (§2.6), exercised on the driver testdata.
  *
  * Role mapping (FIXTURES.md §B): `events(ts, user_id, event_type)` plays the
  * sourcelog `(timestamp_ms, hash, source)` role; `orders`/`lineitem` play
  * transactions ↔ enrichment.
  */
object Core {

  /** Exact decimal sum of a double column, exposed as double: order-of-
    * summation independent, so Spark and DuckDB agree bit-for-bit. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")
  private val dec = "DECIMAL(18,4)"

  // synthetic fixture hash + session-scoped publish machinery live in
  // [[Layouts]] (shared with the sink-contract oracles in SinkOracles)
  import Layouts.{PublishedLayout, syntheticHash}

  private val archiveLayout = new PublishedLayout("archive")
  private val compactLayout = new PublishedLayout("archive-compact")
  private val sourcelogCsvLayout = new PublishedLayout("sourcelog-csv")
  private val hourlyLayout = new PublishedLayout("hourly")
  private val malformedCsvLayout = new PublishedLayout("sourcelog-malformed")
  private val txZipLayout = new PublishedLayout("tx-zip")
  private val streamDedupLayout = new PublishedLayout("stream-dedup")
  private val streamWindowLayout = new PublishedLayout("stream-window")
  private val trashCsvLayout = new PublishedLayout("trash-csv")
  private val streamInclusionLayout = new PublishedLayout("stream-inclusion")

  /** The events table published through the per-day archive sink
    * ([[graft.ops.Sinks.writeDailyArchive]]) so every q_archive_day call
    * reads the same day=yyyy-MM-dd/ layout instead of re-publishing. */
  private[graft] def dailyEventsArchive(s: SparkSession, dir: String): String =
    archiveLayout(s, dir) { path =>
      graft.ops.Sinks.writeDailyArchive(
        Tables.events(s, dir), path, date_format(col("ts"), "yyyy-MM-dd"))
    }

  /** The events daily archive deliberately published as SMALL FILES
    * (a 4-way salted repartition so 4 writer tasks touch every day
    * partition → several files per day), then run
    * through the S11 small-files compactor ([[graft.ops.Sinks
    * .compactDailyArchive]], staged + two-rename swapped per partition).
    * The publish REQUIRES that compaction actually merged files, so the
    * q_archive_compact oracle gates the compactor's losslessness, not a
    * no-op pass-through. */
  private[graft] def compactedEventsArchive(s: SparkSession, dir: String): String =
    compactLayout(s, dir) { path =>
      // direct partitioned write with a 4-way salt — the production
      // writeDailyArchive rebalances small files away, so the fixture
      // must fragment each day on purpose (4 writer tasks touch every
      // day) to give the compactor real work at ANY scale factor
      Tables.events(s, dir)
        .withColumn("day", date_format(col("ts"), "yyyy-MM-dd").cast("date"))
        // explicit partition COUNT: a columns-only repartition is fair
        // game for AQE coalescing, which folds a small fixture into one
        // writer task and defeats the fragmentation on purpose here
        .repartition(4, col("event_id") % 4)
        .write.mode("overwrite").partitionBy("day").parquet(path)
      val stats = graft.ops.Sinks.compactDailyArchive(
        s, path, targetBytes = 8L * 1024 * 1024)
      require(stats.exists { case (_, (before, after)) => after < before },
        "compaction merged nothing — small-file fixture did not materialize")
    }

  /** events recast into the sourcelog role (FIXTURES.md §B): epoch-ms
    * timestamp, a synthetic-but-valid 0x+64-hex hash (md5 pair — DuckDB
    * can derive the identical value), event_type as the source tag. */
  private def eventsAsSourcelog(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).select(
      unix_millis(col("ts")).as("timestamp_ms"),
      syntheticHash(col("event_id")).as("hash"),
      col("event_type").as("source"))

  /** events written through the S12 sourcelog CSV sink once per session,
    * read back through the S1-family CSV source (q_sink_csv_roundtrip). */
  private[graft] def sourcelogCsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = sourcelogCsvLayout(s, dir) { p =>
      graft.ops.Sinks.writeSourcelogCsv(eventsAsSourcelog(s, dir), p)
    }
    graft.ops.Sources.readSourcelogCsv(s, path)
  }

  /** Raw sourcelog CSV text with three deliberate corruption modes mixed
    * in (truncated hash / non-numeric timestamp / missing source column),
    * published once per session. The S3 CSV source must drop exactly the
    * corrupted lines via its schema-cast null filters and the P11 hash
    * predicate — the reference's `continue` branches
    * (common/sourcelog.go:22-48). */
  private[graft] def malformedSourcelogCsv(s: SparkSession, dir: String): String =
    malformedCsvLayout(s, dir) { path =>
      val base = Tables.events(s, dir).select(
        col("event_id").as("id"),
        unix_millis(col("ts")).cast("string").as("ts_ms"),
        syntheticHash(col("event_id")).as("hash"),
        col("event_type").as("source"))
      base.select(
        when(col("id") % 13 === 0, // short hash → P11 length/hex filter
          concat_ws(",", col("ts_ms"), substring(col("hash"), 1, 12), col("source")))
          .when(col("id") % 17 === 0, // non-numeric ts → P10 cast-null filter
            concat_ws(",", concat(lit("t"), col("ts_ms")), col("hash"), col("source")))
          .when(col("id") % 19 === 0, // wrong arity → null source filter
            concat_ws(",", col("ts_ms"), col("hash")))
          .otherwise(concat_ws(",", col("ts_ms"), col("hash"), col("source")))
          .as("value"))
        .write.mode("overwrite").text(path)
    }

  /** Collector-shaped tx CSVs packed into `.csv.zip` archives (one per
    * Spark part file, plus a non-CSV member the reader must skip),
    * published once per session. Zipping is driver-side file IO over the
    * written parts — input synthesis, not engine work; the engine op
    * under test is the streaming per-task ZIP decode (S2). */
  private[graft] def txCsvZipDir(s: SparkSession, dir: String): String =
    txZipLayout(s, dir) { path =>
      Tables.events(s, dir).select(concat_ws(",",
        unix_millis(col("ts")),
        syntheticHash(col("event_id")),
        concat(lit("0x"), md5((col("event_id") + 2).cast("string"))))
        .as("value"))
        .write.mode("overwrite").text(s"$path/csv")
      val zips = java.nio.file.Paths.get(path, "zips")
      java.nio.file.Files.createDirectories(zips)
      val parts = java.nio.file.Files.list(java.nio.file.Paths.get(path, "csv"))
      try parts.iterator().forEachRemaining { p =>
          if (p.getFileName.toString.startsWith("part-")) {
            val out = new java.util.zip.ZipOutputStream(
              java.nio.file.Files.newOutputStream(
                zips.resolve(p.getFileName.toString + ".csv.zip")))
            try {
              out.putNextEntry(new java.util.zip.ZipEntry("README.txt"))
              out.write("not a csv member — the reader must skip this\n"
                .getBytes("UTF-8"))
              out.closeEntry()
              out.putNextEntry(new java.util.zip.ZipEntry("transactions.csv"))
              java.nio.file.Files.copy(p, out)
              out.closeEntry()
            } finally out.close()
          }
        }
      finally parts.close()
    }

  /** The A5 streaming TTL dedup run through the REAL Structured Streaming
    * engine once per session: a collector-shaped feed (hash keyed on
    * user_id → heavy duplicates; all rows timestamp-compressed inside one
    * TTL window so earliest-wins is the exact expected output) is written
    * as ONE csv file → one micro-batch through [[graft.streaming.Collect
    * .dedupStateful]] (flatMapGroupsWithState, event-time TTL state) into
    * a memory sink, and the emitted rows are frozen to parquet. The
    * timestamps are base + event_id·10 — globally unique, so min-by-ts
    * has no ties and the keep is deterministic. */
  private[graft] def streamDedupResult(s: SparkSession, dir: String): DataFrame = {
    val path = streamDedupLayout(s, dir) { p =>
      Tables.events(s, dir).select(concat_ws(",",
        lit(1700000000000L) + col("event_id") * 10,
        syntheticHash(col("user_id")),
        concat(lit("0x"), md5(col("event_id").cast("string"))),
        col("event_type")).as("value"))
        .coalesce(1)
        .write.mode("overwrite").text(s"$p/in")
      val qn = "stream_dedup_" + math.abs(p.hashCode).toString
      // AvailableNow: process the one fixture batch and stop — identical
      // emission set to the default trigger (the file is one micro-batch
      // either way), minus the idle trigger-latency tail (VERDICT r10 #6).
      // This one streaming oracle runs on the RocksDB state provider (the
      // disk-backed store a corpus-scale dedup window needs), so the
      // 100 TB state path is gated by the driver's DuckDB compare, not
      // just by CollectStreamSpec's provider-parity test; the provider is
      // captured per query at start, and the session conf is restored so
      // the other streaming oracles keep exercising the default store.
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prevProvider = s.conf.getOption(key)
      graft.streaming.Collect.useRocksDbState(s)
      // Fixture state LAYOUT, not an engine config (r22, StreamStateProbe:
      // a one-shot 32-state-partition run pays ~6 s of per-instance store
      // setup/commit that 4 partitions do not — 8.0 -> 1.9 s warm minima;
      // per-key emissions are partition-count-independent, so values are
      // identical). This one-shot oracle run checkpoints into a throwaway
      // temp dir — no deployment checkpoint pins its partitioning — and 4
      // partitions still exercise the engine's PARTITIONED state path
      // (shuffle, per-partition RocksDB instances, watermark merge). A
      // deployment sizes state partitions to its corpus via the session
      // conf, which is restored below.
      val pKey = "spark.sql.shuffle.partitions"
      val prevParts = s.conf.get(pKey)
      s.conf.set(pKey, "4")
      val q =
        try graft.streaming.Collect.dedupStateful(
          graft.streaming.Collect.feed(s, s"$p/in"))
          .writeStream.format("memory").queryName(qn).outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        finally {
          prevProvider match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
          s.conf.set(pKey, prevParts)
        }
      try q.processAllAvailable() finally q.stop()
      s.table(qn).select("timestamp_ms", "hash", "raw_tx_hex", "source")
        .write.mode("overwrite").parquet(s"$p/out")
    }
    s.read.parquet(s"$path/out")
  }

  /** The A13/A14 per-minute source counters run through the real streaming
    * engine once per session: one day of events as a collector feed →
    * [[graft.streaming.Collect.sourceMetrics]] (1-minute tumbling windows)
    * → memory sink in complete mode, frozen to parquet. Only the exact
    * count column is kept — the approximate-uniques column is monitoring
    * output no SQL engine reproduces bit-for-bit. */
  private[graft] def streamWindowResult(s: SparkSession, dir: String): DataFrame = {
    val path = streamWindowLayout(s, dir) { p =>
      Tables.events(s, dir)
        .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
          col("ts") < lit("2024-01-11").cast("timestamp"))
        .select(concat_ws(",",
          unix_millis(col("ts")),
          syntheticHash(col("event_id")),
          concat(lit("0x"), md5((col("event_id") + 2).cast("string"))),
          col("event_type")).as("value"))
        .coalesce(1)
        .write.mode("overwrite").text(s"$p/in")
      val qn = "stream_window_" + math.abs(p.hashCode).toString
      // same fixture state-layout choice as streamDedupResult (one-shot
      // throwaway-checkpoint run; exact counts are partition-independent)
      val pKey = "spark.sql.shuffle.partitions"
      val prevParts = s.conf.get(pKey)
      s.conf.set(pKey, "4")
      val q =
        try graft.streaming.Collect.sourceMetrics(
          graft.streaming.Collect.feed(s, s"$p/in"))
          .writeStream.format("memory").queryName(qn).outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        finally s.conf.set(pKey, prevParts)
      try q.processAllAvailable() finally q.stop()
      s.table(qn).select("minute", "source", "n_all")
        .write.mode("overwrite").parquet(s"$p/out")
    }
    s.read.parquet(s"$path/out")
  }

  /** A3 trash merge → S12 trash CSV sink → S3 trash CSV source, published
    * once per session. The trash fixture keys hashes on user_id so each
    * (hash, source) pair recurs with distinct timestamps — the
    * min-struct earliest-wins keep does real work. */
  private[graft] def trashRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val path = trashCsvLayout(s, dir) { p =>
      val trashIn = Tables.events(s, dir).select(
        unix_millis(col("ts")).as("timestamp_ms"),
        syntheticHash(col("user_id")).as("hash"),
        col("event_type").as("source"),
        when(col("event_id") % 3 === 0, "low-fee")
          .when(col("event_id") % 3 === 1, "bad-sig")
          .otherwise("decode-error").as("reason"),
        lit("").as("notes"))
      graft.ops.Sinks.writeTrashCsv(graft.jobs.Merge.mergeTrash(trashIn), p)
    }
    graft.ops.Sources.readTrashCsv(s, path)
      .withColumn("notes", coalesce(col("notes"), lit("")))
  }

  /** The J4 collector inline inclusion check through the real streaming
    * engine once per session: a stream-static broadcast join against a
    * blocks dim (every 4th event's hash), rejects tagged
    * `tx-already-onchain`, frozen to parquet. */
  private[graft] def streamInclusionResult(s: SparkSession, dir: String): DataFrame = {
    val path = streamInclusionLayout(s, dir) { p =>
      Tables.events(s, dir).select(concat_ws(",",
        unix_millis(col("ts")),
        syntheticHash(col("event_id")),
        concat(lit("0x"), md5((col("event_id") + 2).cast("string"))),
        col("event_type")).as("value"))
        .coalesce(1)
        .write.mode("overwrite").text(s"$p/in")
      val blocks = Tables.events(s, dir)
        .filter(col("event_id") % 4 === 0)
        .select(syntheticHash(col("event_id")).as("hash"))
      val qn = "stream_incl_" + math.abs(p.hashCode).toString
      val q = graft.streaming.Collect.inclusionCheck(
        graft.streaming.Collect.feed(s, s"$p/in")
          .withColumn("reason", lit(null).cast("string")),
        blocks)
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.processAllAvailable() finally q.stop()
      s.table(qn).select("timestamp_ms", "hash", "source", "reason")
        .write.mode("overwrite").parquet(s"$p/out")
    }
    s.read.parquet(s"$path/out")
  }

  /** One week of events written through the S15 hourly-bucketed CSV sink
    * once per session (~168 date=…/hour=… partitions at any SF). */
  private[graft] def hourlyEventsLayout(s: SparkSession, dir: String): String =
    hourlyLayout(s, dir) { path =>
      graft.ops.Sinks.writeHourlyBucketed(
        Tables.events(s, dir)
          .filter(col("ts") >= lit("2024-01-08").cast("timestamp") &&
            col("ts") < lit("2024-01-15").cast("timestamp"))
          .select("event_id", "event_type", "ts"),
        "ts", path)
    }

  val defs: Map[String, QueryDef] = Map(

    // ── Aggregation pack ────────────────────────────────────────────────

    // A6-A8 analyzer shape (common/analyzer.go:83-95): grouped counts, byte
    // sums and value sums per category — TPC-H Q1 pricing-summary form.
    "q_agg_pricing" -> QueryDef.sql(
      "A6-A8: grouped count/sum aggregate pack (hash partial+final agg)",
      // sum_disc is rescaled to 4 decimals BEFORE the double cast: DuckDB's
      // decimal→double conversion is only correctly rounded while the scaled
      // integer fits in 2^53, which scale-8 sums of ~5e9 exceed (observed
      // 1-ulp flake at sf0.1). Both engines rescale with HALF_UP, and at
      // scale 4 the conversion is one exact int→double + one IEEE divide.
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(CAST(l_quantity AS $dec)) AS DOUBLE) AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS $dec)) AS DOUBLE) AS sum_base,
         |  CAST(CAST(SUM(CAST(l_extendedprice AS $dec) * (CAST(1 AS $dec) - CAST(l_discount AS $dec))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base"),
          sum(col("l_extendedprice").cast(DecimalType(18, 4)) *
            (lit(1).cast(DecimalType(18, 4)) - col("l_discount").cast(DecimalType(18, 4))))
            .cast(DecimalType(38, 4)).cast("double").as("sum_disc"),
          count(lit(1)).as("n"))
    },

    // A2 sourcelog dedup (common/sourcelog.go:52-62): earliest ts per
    // (hash, source) → (user_id, event_type).
    "q_dedup_earliest" -> QueryDef.sql(
      "A2: earliest-wins dedup per (key, source)",
      """SELECT user_id, event_type, min(ts) AS first_ts, COUNT(*) AS n_seen
        |FROM events GROUP BY user_id, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id", "event_type")
        .agg(min("ts").as("first_ts"), count(lit(1)).as("n_seen"))
    },

    // A1 tx dedup (common/txsfile.go:121-129): first record wins for the
    // payload, timestamp lowered to the earliest duplicate. min(struct) is a
    // single partial+final hash agg — no window shuffle+sort needed; tie-break
    // by unique event_id keeps it deterministic for the oracle.
    "q_dedup_first_payload" -> QueryDef.sql(
      "A1: earliest-record-wins dedup keeping whole payload (min_by struct)",
      """SELECT user_id, ts AS first_ts, event_id, event_type FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .agg(min(struct(col("ts"), col("event_id"), col("event_type"))).as("f"))
        .select(col("user_id"), col("f.ts").as("first_ts"),
          col("f.event_id"), col("f.event_type"))
    },

    // A6: unique-key count (common/analyzer.go:83).
    "q_count_distinct" -> QueryDef.sql(
      "A6: exact distinct count over the event stream",
      "SELECT COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events FROM events") { (s, dir) =>
      Tables.events(s, dir)
        .agg(countDistinct("user_id").as("n_users"), count(lit(1)).as("n_events"))
    },

    // A7: included vs not-included conditional counts (common/analyzer.go:87-91).
    "q_conditional_counts" -> QueryDef.sql(
      "A7: conditional sum(case when) counts per flag",
      """SELECT
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_included,
        |  CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
        |FROM orders""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast("long").as("n_included"),
        sum(when(col("o_orderstatus") =!= "F", 1).otherwise(0)).cast("long").as("n_pending"))
    },

    // A8: count + byte volume per type (common/analyzer.go:93-95).
    "q_type_bytes" -> QueryDef.sql(
      "A8: per-type row count and payload byte sum",
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(length(props)) AS BIGINT) AS bytes
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(length(col("props"))).cast("long").as("bytes"))
    },

    // A9-A10: explode(sources) → count per source (common/analyzer.go:97-108).
    // Array built per key with collect_set, then exploded — the same DAG the
    // mempool `sources` column flows through.
    "q_explode_sources" -> QueryDef.sql(
      "A9-A10: per-source counts via collect_set + explode",
      """SELECT event_type AS src, COUNT(*) AS n_keys
        |FROM (SELECT DISTINCT user_id, event_type FROM events) GROUP BY src""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id").agg(collect_set("event_type").as("sources"))
        .select(explode(col("sources")).as("src"))
        .groupBy("src").agg(count(lit(1)).as("n_keys"))
    },

    // A11: exclusive-orderflow — keys seen by exactly one source
    // (common/analyzer.go:109-122): size(sources)==1 → element_at. Keyed on
    // (user, day) so exclusivity actually occurs in the testdata.
    "q_xof_exclusive" -> QueryDef.sql(
      "A11: exclusive-source keys (size(sources)=1, element_at)",
      """SELECT src, COUNT(*) AS n_exclusive FROM (
        |  SELECT user_id, date_trunc('day', ts) AS day, min(event_type) AS src FROM events
        |  GROUP BY user_id, day HAVING COUNT(DISTINCT event_type) = 1)
        |GROUP BY src""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .agg(sort_array(collect_set("event_type")).as("sources"))
        .filter(size(col("sources")) === 1)
        .select(element_at(col("sources"), 1).as("src"))
        .groupBy("src").agg(count(lit(1)).as("n_exclusive"))
    },

    // A12: first/last timestamp + duration (common/analyzer.go:126-137).
    "q_minmax_duration" -> QueryDef.sql(
      "A12: global min/max event time and duration in ms",
      """SELECT min(ts) AS first_seen, max(ts) AS last_seen,
        |  (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000 AS duration_ms,
        |  COUNT(*) AS n
        |FROM events""".stripMargin) { (s, dir) =>
      Tables.events(s, dir).agg(
        min("ts").as("first_seen"), max("ts").as("last_seen"),
        expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000").as("duration_ms"),
        count(lit(1)).as("n"))
    },

    // A13-A14: tumbling per-minute counters (collector/tx_processor.go:530-550)
    // as a batch query: date_trunc minute buckets.
    // Sessionization (differential-tested): split each user's event stream
    // into sessions at >30-minute gaps — lag marks session starts, a
    // running sum numbers them, then one aggregate per session. Two
    // windows + the aggregate all cluster on user_id, so the whole
    // operator is ONE shuffle; the training-data analogue is grouping a
    // crawl into page-visit sessions.
    "q_sessionize" -> QueryDef.sql(
      "sessionization: 30-min-gap session ids via lag + running sum",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |    THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (
        |  SELECT user_id, ts,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS session_no
        |  FROM o)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  COUNT(*) AS n_events,
        |  CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000 AS BIGINT) AS duration_ms
        |FROM s GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("is_new",
          when(lag(col("ts"), 1).over(byUser).isNull ||
            unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
              > 1800000000L, 1L).otherwise(0L))
        .withColumn("session_no", sum(col("is_new")).over(run))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000").as("duration_ms"))
    },

    "q_window_minute" -> QueryDef.sql(
      "A13-A14: per-minute tumbling counts + exact uniques",
      """SELECT date_trunc('minute', ts) AS minute, COUNT(*) AS n,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY minute""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_trunc("minute", col("ts")).as("minute"))
        .agg(count(lit(1)).as("n"), countDistinct("user_id").as("n_users"))
    },

    // Date-partitioned archive read (VERDICT r6 item 7): the reference's
    // archive is per-day by construction (README.md:82; scripts/
    // upload.sh:50-66) — here the events table is published once per
    // dataset through [[graft.ops.Sinks.writeDailyArchive]] into
    // day=yyyy-MM-dd/ partitions (memoized like the trained ANN indexes),
    // and the query reads ONE day back. The filter lands on the partition
    // column, so the scan lists exactly that day's files — at a
    // multi-year 100 TB archive the read cost is one day's slice, not a
    // scan-and-discard over the whole table. ScalePlanSpec asserts the
    // single-partition selection on this exact query.
    "q_archive_day" -> QueryDef.sql(
      "date-partitioned archive: one-day slice aggregate over a pruned scan",
      """SELECT event_type, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE), 6) AS sum_value_r
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
        |GROUP BY event_type""".stripMargin) { (s, dir) =>
      s.read.parquet(dailyEventsArchive(s, dir))
        .filter(col("day") === lit("2024-01-15").cast("date"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(DecimalType(28, 12))).cast("double"), 6)
            .as("sum_value_r"))
    },

    // S11 compaction losslessness, driver-verified: the whole archive —
    // every day partition AFTER the small-files compactor rewrote it —
    // aggregated and hash-compared against a direct re-derivation from
    // the source table. A dropped row, a duplicated row (staging swap
    // replayed), or a value mangled in the rewrite breaks the hash.
    "q_archive_compact" -> QueryDef.sql(
      "S11: compacted day-partitioned archive vs direct re-derivation",
      """SELECT strftime(ts, '%Y-%m-%d') AS day_s, event_type, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(28,12))) AS DOUBLE), 6) AS sum_value_r
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      s.read.parquet(compactedEventsArchive(s, dir))
        .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day_s"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast(DecimalType(28, 12))).cast("double"), 6)
            .as("sum_value_r"))
    },

    // ── Filters ─────────────────────────────────────────────────────────

    // F1 already-included filter (common/txsummary.go:84-87): compound
    // NOT(a AND b) predicate, pushed to the parquet scan.
    "q_filter_threshold" -> QueryDef.sql(
      "F1: compound NOT(a>x AND b<=y) discard filter",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE NOT (l_quantity > 45 AND l_discount <= 0.01)""".stripMargin) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(!(col("l_quantity") > 45 && col("l_discount") <= 0.01))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    },

    // F2 validation reason chain (collector/tx_processor.go:355-416): a
    // when()-chain assigns the first failing reason; nulls = valid rows.
    "q_validate_reasons" -> QueryDef.sql(
      "F2: validation when-chain → reason side-channel counts",
      """SELECT COALESCE(CASE
        |    WHEN o_totalprice < 1000 THEN 'low value'
        |    WHEN o_orderpriority = '5-LOW' THEN 'low priority'
        |    WHEN o_orderstatus = 'P' THEN 'pending'
        |    END, 'ok') AS reason, COUNT(*) AS n
        |FROM orders GROUP BY reason""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("reason", coalesce(
          when(col("o_totalprice") < 1000, "low value")
            .when(col("o_orderpriority") === "5-LOW", "low priority")
            .when(col("o_orderstatus") === "P", "pending"),
          lit("ok")))
        .groupBy("reason").agg(count(lit(1)).as("n"))
    },

    // F4/F6: source allowlist via IN (collector/tx_processor.go:178-181).
    "q_filter_allowlist" -> QueryDef.sql(
      "F4: isin allowlist filter + group count",
      """SELECT event_type, COUNT(*) AS n FROM events
        |WHERE event_type IN ('click', 'view', 'purchase') GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_type").isin("click", "view", "purchase"))
        .groupBy("event_type").agg(count(lit(1)).as("n"))
    },

    // F6 array predicates (README.md:113-137): has(sources, x),
    // hasAll(sources, [..]), size(sources)=1 — on per-key collect_set arrays.
    "q_array_predicates" -> QueryDef.sql(
      "F6: array_contains / hasAll / size predicates over sources arrays",
      """SELECT
        |  CAST(SUM(CASE WHEN has_click THEN 1 ELSE 0 END) AS BIGINT) AS n_has,
        |  CAST(SUM(CASE WHEN has_click AND has_view THEN 1 ELSE 0 END) AS BIGINT) AS n_has_all,
        |  CAST(SUM(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_exclusive
        |FROM (
        |  SELECT user_id,
        |    bool_or(event_type = 'click') AS has_click,
        |    bool_or(event_type = 'view') AS has_view,
        |    COUNT(DISTINCT event_type) AS n_src
        |  FROM events GROUP BY user_id)""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id").agg(collect_set("event_type").as("sources"))
        .agg(
          sum(when(array_contains(col("sources"), "click"), 1).otherwise(0))
            .cast("long").as("n_has"),
          sum(when(size(array_except(typedLit(Seq("click", "view")), col("sources"))) === 0, 1)
            .otherwise(0)).cast("long").as("n_has_all"),
          sum(when(size(col("sources")) === 1, 1).otherwise(0)).cast("long").as("n_exclusive"))
    },

    // P10/P11-style projection: regex extraction + cast from the raw props
    // payload (the reference's CSV field parsing, common/txsfile.go:107-112).
    "q_regex_extract" -> QueryDef.sql(
      "P10/P11: regex extract + cast + validity filter",
      """SELECT k_bucket, COUNT(*) AS n FROM (
        |  SELECT CAST(regexp_extract(props, 'k": (\d+)', 1) AS BIGINT) % 10 AS k_bucket
        |  FROM events) WHERE k_bucket IS NOT NULL GROUP BY k_bucket""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .select((regexp_extract(col("props"), "k\": (\\d+)", 1).cast("long") % 10).as("k_bucket"))
        .filter(col("k_bucket").isNotNull)
        .groupBy("k_bucket").agg(count(lit(1)).as("n"))
    },

    // F5: half-open time-range predicate (cmd/merge/clickhouse.go:77) —
    // the scan-pruning filter shape for partitioned archives.
    "q_time_range" -> QueryDef.sql(
      "F5: received_at >= from AND < to range scan + rollup",
      """SELECT event_type, COUNT(*) AS n, min(ts) AS first_ts
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("ts").as("first_ts"))
    },

    // P7/P12: date formatting + parse round-trip (common/utils.go:161-209).
    "q_date_format" -> QueryDef.sql(
      "P7: per-day date formatting rollup",
      """SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS day_total
        |FROM orders GROUP BY day""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double").as("day_total"))
    },

    // ── Sorts / limits / union ──────────────────────────────────────────

    // O1+O5+O7: global sort + limit with deterministic tie-break
    // (cmd/merge/transactions.go:153-161).
    "q_sort_topk" -> QueryDef.sql(
      "O1/O5: global order-by with unique tie-break + limit",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(25)
    },

    // O6: multi-input union + distinct (common/fileutils.go:50-60 →
    // UNION ALL then dedup-by-key).
    "q_union_distinct" -> QueryDef.sql(
      "O6: union of two inputs + distinct",
      """SELECT o_custkey AS key FROM orders
        |UNION SELECT c_custkey AS key FROM customer""".stripMargin) { (s, dir) =>
      Tables.orders(s, dir).select(col("o_custkey").as("key"))
        .union(Tables.customer(s, dir).select(col("c_custkey").as("key")))
        .distinct()
    },

    // ── Sinks, driver-verified round-trips ──────────────────────────────

    // S12 sourcelog CSV sink → S1-family CSV source: the layout (header,
    // ts sort, positional columns) and the read-path filters must
    // round-trip losslessly — the oracle recomputes the aggregate straight
    // from the parquet table, so any corruption in either direction breaks
    // the hash. The write happens once per session (PublishedLayout).
    "q_sink_csv_roundtrip" -> QueryDef.sql(
      "S12/S3: sourcelog CSV sink → CSV source round-trip, per-source aggregate",
      """SELECT event_type AS source, COUNT(*) AS n,
        |  MIN(epoch_ms(ts)) AS min_ts, MAX(epoch_ms(ts)) AS max_ts,
        |  COUNT(DISTINCT md5(CAST(event_id AS VARCHAR))) AS n_hash
        |FROM events GROUP BY event_type""".stripMargin) { (s, dir) =>
      sourcelogCsvRoundtrip(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          min("timestamp_ms").as("min_ts"), max("timestamp_ms").as("max_ts"),
          countDistinct(substring(col("hash"), 3, 32)).as("n_hash"))
    },

    // F3/P10/P11 malformed-line skip: the CSV source must drop EXACTLY the
    // corrupted lines (short hash, non-numeric timestamp, wrong arity) —
    // the oracle re-derives the surviving set from the parquet table by
    // excluding the same id classes, so both over- and under-filtering
    // break the hash.
    "q_source_malformed_skip" -> QueryDef.sql(
      "F3: CSV scan drops exactly the malformed lines (3 corruption modes)",
      """SELECT event_type AS source, COUNT(*) AS n,
        |  MIN(epoch_ms(ts)) AS min_ts, MAX(epoch_ms(ts)) AS max_ts,
        |  COUNT(DISTINCT md5(CAST(event_id AS VARCHAR))) AS n_hash
        |FROM events
        |WHERE event_id % 13 <> 0 AND event_id % 17 <> 0 AND event_id % 19 <> 0
        |GROUP BY event_type""".stripMargin) { (s, dir) =>
      graft.ops.Sources.readSourcelogCsv(s, malformedSourcelogCsv(s, dir))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          min("timestamp_ms").as("min_ts"), max("timestamp_ms").as("max_ts"),
          countDistinct(substring(col("hash"), 3, 32)).as("n_hash"))
    },

    // S2 CSV-in-ZIP scan: the per-task streaming ZIP decode must surface
    // every line of every .csv member (skipping the planted non-CSV
    // member) — the oracle recomputes the bucketed aggregate from parquet,
    // so a dropped member, a dropped line, or buffered bytes crossing an
    // entry boundary all break the hash.
    "q_source_zip_scan" -> QueryDef.sql(
      "S2: csv-in-zip archive scan (streaming per-task decode) vs parquet re-derivation",
      """SELECT substring(md5(CAST(event_id AS VARCHAR)), 1, 1) AS bucket,
        |  COUNT(*) AS n, MIN(epoch_ms(ts)) AS min_ts, MAX(epoch_ms(ts)) AS max_ts,
        |  COUNT(DISTINCT md5(CAST(event_id AS VARCHAR))) AS n_hash
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.ops.Sources.readTxCsvZip(s, s"${txCsvZipDir(s, dir)}/zips/*.csv.zip")
        .groupBy(substring(col("hash"), 3, 1).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("timestamp_ms").as("min_ts"), max("timestamp_ms").as("max_ts"),
          countDistinct(substring(col("hash"), 3, 32)).as("n_hash"))
    },

    // P8/P9/S13 report formatting: thousands-grouped counts, one-decimal
    // floor percentages, and human-bytes labels as engine-side strings.
    // All fractional steps use exact integer division (x*1000 div total,
    // x*10 div 1024^k) so both engines format the same k/10 value — no
    // float-rounding disputes in the last decimal.
    "q_report_format" -> QueryDef.sql(
      "P8/P9: report-renderer formatting (grouped counts, floor-pct, human bytes)",
      """WITH agg AS (
        |  SELECT event_type AS source, COUNT(*) AS n,
        |    CAST(SUM(event_id) AS BIGINT) AS b
        |  FROM events GROUP BY event_type
        |), tot AS (SELECT SUM(n) AS tot FROM agg)
        |SELECT source,
        |  format('{:,}', n) AS n_fmt,
        |  printf('%.1f%%', ((n * 1000 // tot)) / 10.0) AS pct_fmt,
        |  CASE WHEN b < 1024 THEN CAST(b AS VARCHAR) || ' B'
        |       WHEN b < 1048576 THEN printf('%.1f KB', (b * 10 // 1024) / 10.0)
        |       WHEN b < 1073741824 THEN printf('%.1f MB', (b * 10 // 1048576) / 10.0)
        |       ELSE printf('%.1f GB', (b * 10 // 1073741824) / 10.0) END AS bytes_h
        |FROM agg, tot""".stripMargin) { (s, dir) =>
      val agg = Tables.events(s, dir)
        .groupBy(col("event_type").as("source"))
        .agg(count(lit(1)).as("n"), sum(col("event_id")).as("b"))
      val tot = agg.agg(sum("n").as("tot"))
      // one-decimal string from exact integer parts — NOT format_number,
      // whose thousands-grouping would insert commas at >= 1,000.0 (e.g.
      // "1,023.9 KB" vs the oracle printf's "1023.9 KB"); DuckDB's
      // printf('%.1f') never groups
      def tenth(e: String): Column =
        concat(expr(s"($e) div 10").cast("string"), lit("."),
          expr(s"($e) % 10").cast("string"))
      agg.crossJoin(broadcast(tot)).select(
        col("source"),
        format_number(col("n"), 0).as("n_fmt"),
        concat(tenth("n * 1000 div tot"), lit("%")).as("pct_fmt"),
        when(col("b") < 1024L, concat(col("b").cast("string"), lit(" B")))
          .when(col("b") < 1048576L, concat(tenth("b * 10 div 1024"), lit(" KB")))
          .when(col("b") < 1073741824L, concat(tenth("b * 10 div 1048576"), lit(" MB")))
          .otherwise(concat(tenth("b * 10 div 1073741824"), lit(" GB")))
          .as("bytes_h"))
    },

    // S1 plain tx CSV scan: same published lines as the zip variant (the
    // layout's csv/ subdir), read through the schema-cast `readTxCsv`
    // path instead of the per-task zip decoder — the two queries carry
    // the SAME oracle, so the plain and zip read paths are also
    // transitively proven equal.
    "q_source_tx_csv" -> QueryDef.sql(
      "S1: plain collector tx CSV scan (schema cast + validity filters)",
      """SELECT substring(md5(CAST(event_id AS VARCHAR)), 1, 1) AS bucket,
        |  COUNT(*) AS n, MIN(epoch_ms(ts)) AS min_ts, MAX(epoch_ms(ts)) AS max_ts,
        |  COUNT(DISTINCT md5(CAST(event_id AS VARCHAR))) AS n_hash
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.ops.Sources.readTxCsv(s, s"${txCsvZipDir(s, dir)}/csv")
        .groupBy(substring(col("hash"), 3, 1).as("bucket"))
        .agg(count(lit(1)).as("n"),
          min("timestamp_ms").as("min_ts"), max("timestamp_ms").as("max_ts"),
          countDistinct(substring(col("hash"), 3, 32)).as("n_hash"))
    },

    // A5 streaming TTL dedup, driver-verified through the REAL streaming
    // engine (flatMapGroupsWithState + event-time TTL state + memory
    // sink): earliest-wins per hash inside one TTL window. The oracle
    // re-derives the expected emission set with a window rank over the
    // same synthetic feed.
    "q_stream_dedup_ttl" -> QueryDef.sql(
      "A5: streaming TTL dedup (flatMapGroupsWithState) vs SQL earliest-wins",
      """SELECT timestamp_ms, hash, raw_tx_hex, source FROM (
        |  SELECT 1700000000000 + event_id * 10 AS timestamp_ms,
        |    '0x' || md5(CAST(user_id AS VARCHAR))
        |         || md5(CAST(user_id + 1 AS VARCHAR)) AS hash,
        |    '0x' || md5(CAST(event_id AS VARCHAR)) AS raw_tx_hex,
        |    event_type AS source,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin) { (s, dir) =>
      streamDedupResult(s, dir)
    },

    // A13/A14 per-minute source counters via the real streaming engine
    // (1-minute tumbling windows, complete mode): the window starts and
    // exact counts must match a batch date_trunc re-derivation. The feed
    // truncates timestamps to millis (the collector wire format), so the
    // oracle buckets epoch-ms the same way.
    "q_stream_window_counts" -> QueryDef.sql(
      "A13/A14: streaming 1-min tumbling per-source counts vs date_trunc oracle",
      """SELECT make_timestamp((epoch_ms(ts) // 60000) * 60000000) AS minute,
        |  event_type AS source, COUNT(*) AS n_all
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-11'
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      streamWindowResult(s, dir)
    },

    // A3 trash merge + S12/S3 trash CSV round-trip: earliest (hash, source)
    // entry wins carrying ITS reason/notes (min-struct); the oracle is a
    // window rank over the same derivation, ordered by the struct's exact
    // comparison key, so the keep rule and the CSV layout both gate.
    "q_trash_roundtrip" -> QueryDef.sql(
      "A3/S12/S3: trash merge earliest-wins → CSV sink → CSV source round-trip",
      """WITH t AS (
        |  SELECT epoch_ms(ts) AS timestamp_ms,
        |    '0x' || md5(CAST(user_id AS VARCHAR))
        |         || md5(CAST(user_id + 1 AS VARCHAR)) AS hash,
        |    event_type AS source,
        |    CASE event_id % 3 WHEN 0 THEN 'low-fee' WHEN 1 THEN 'bad-sig'
        |         ELSE 'decode-error' END AS reason,
        |    '' AS notes
        |  FROM events)
        |SELECT timestamp_ms, hash, source, reason, notes FROM (
        |  SELECT *, row_number() OVER (PARTITION BY hash, source
        |    ORDER BY timestamp_ms, reason, notes) AS rn FROM t
        |) WHERE rn = 1""".stripMargin) { (s, dir) =>
      trashRoundtrip(s, dir)
    },

    // J4 collector inline inclusion check via the real streaming engine:
    // stream-static broadcast join, on-chain hashes tagged with the trash
    // reason; the oracle re-derives the tag from the dim membership rule.
    "q_stream_inclusion" -> QueryDef.sql(
      "J4: streaming stream-static inclusion check vs SQL join re-derivation",
      """SELECT epoch_ms(ts) AS timestamp_ms,
        |  '0x' || md5(CAST(event_id AS VARCHAR))
        |       || md5(CAST(event_id + 1 AS VARCHAR)) AS hash,
        |  event_type AS source,
        |  CASE WHEN event_id % 4 = 0 THEN 'tx-already-onchain' END AS reason
        |FROM events""".stripMargin) { (s, dir) =>
      streamInclusionResult(s, dir)
    },

    // S15 hourly-bucketed layout: date=…/hour=… partition values must
    // reconstruct each row's receive hour exactly (the collector's
    // timestamp/3600 bucketing, collector/tx_processor.go:421-423); the
    // oracle re-derives the buckets from the raw timestamps.
    "q_sink_hourly" -> QueryDef.sql(
      "S15: hourly-bucketed sink layout → per-bucket counts off partition values",
      """SELECT strftime(ts, '%Y-%m-%d') AS date_s, strftime(ts, '%H') AS hour_s,
        |  COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS sum_id
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      s.read.option("header", "true").csv(hourlyEventsLayout(s, dir))
        .groupBy(
          col("date").cast("string").as("date_s"),
          lpad(col("hour").cast("string"), 2, "0").as("hour_s"))
        .agg(count(lit(1)).as("n"),
          sum(col("event_id").cast("long")).as("sum_id"))
    }
  )
}
