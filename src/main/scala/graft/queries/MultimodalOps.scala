package graft.queries

import graft.QueryDef
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column queries (decode stubbed; plumbing real). */
object MultimodalOps {

  /** The feature table's DuckDB twin. The decode stub's features are pure
    * byte-level functions of the payload (which the fixture derives from
    * the document text), so the oracle recomputes them from
    * `hex(encode(text))`: bin = high-nibble÷2 for the 8-bin histogram,
    * thumb_sig = the first-8-bytes big-endian fold with two's-complement
    * wrap done in HUGEINT, frame count = min(8, bytes). This makes the
    * whole mapPartitions batch-decode path hash-checked end-to-end — a
    * real codec swap re-opens the rows-only boundary, but the PLUMBING
    * (schema, batching, per-doc byte accounting) is verified exactly. */
  private val FeaturesOracleCtes: String =
    """m AS (
      |  SELECT doc_id AS media_id,
      |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |      ELSE 'video' END AS media_type,
      |    hex(encode(text)) AS hx,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      |  FROM documents),
      |bb AS (
      |  SELECT media_id,
      |    (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1) // 2 AS bin
      |  FROM (SELECT media_id, hx,
      |          unnest(generate_series(1, CAST(n_bytes AS INT))) AS i FROM m)),
      |hh AS (
      |  SELECT media_id,
      |    SUM(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS c0,
      |    SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS c3
      |  FROM bb GROUP BY 1),
      |sg AS (
      |  SELECT media_id,
      |    SUM(CAST(strpos('0123456789ABCDEF', substr(p, i, 1)) - 1 AS HUGEINT)
      |      << (4 * (length(p) - i))) AS u
      |  FROM (SELECT media_id, p, unnest(generate_series(1, length(p))) AS i
      |        FROM (SELECT media_id, substr(hx, 1, 16) AS p FROM m))
      |  GROUP BY 1),
      |feats AS (
      |  SELECT m.media_id, m.media_type, m.n_bytes,
      |    round(CAST(COALESCE(hh.c0, 0) AS DOUBLE) / GREATEST(m.n_bytes, 1), 6) AS hist_0,
      |    round(CAST(COALESCE(hh.c3, 0) AS DOUBLE) / GREATEST(m.n_bytes, 1), 6) AS hist_3,
      |    CAST(COALESCE(CASE WHEN u >= (CAST(1 AS HUGEINT) << 63)
      |      THEN u - (CAST(1 AS HUGEINT) << 64) ELSE u END, 0) AS BIGINT) AS thumb_sig,
      |    CAST(LEAST(8, m.n_bytes) AS INT) AS n_frames
      |  FROM m LEFT JOIN hh USING (media_id) LEFT JOIN sg USING (media_id))""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "q_multimodal_features" -> QueryDef.sql(
      "binary media column → per-partition batch decode (stub) → features",
      s"""WITH $FeaturesOracleCtes
         |SELECT * FROM feats""".stripMargin) {
      (s, dir) => Multimodal.featuresDF(s, dir)
    },
    "q_multimodal_stats" -> QueryDef.sql(
      "media features rollup per media_type",
      s"""WITH $FeaturesOracleCtes
         |SELECT media_type, COUNT(*) AS n,
         |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |  round(CAST(SUM(CAST(hist_3 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6)
         |    AS avg_hist3
         |FROM feats GROUP BY 1""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.types.DecimalType
      // exact-decimal mean: hist_3 is a rounded-to-6 value, so the decimal
      // cast recovers it exactly and the sum is order-independent
      Multimodal.featuresDF(s, dir)
        .groupBy("media_type")
        .agg(count(lit(1)).as("n"),
          sum("n_bytes").as("total_bytes"),
          round(sum(col("hist_3").cast(DecimalType(28, 12))).cast("double") /
            count(lit(1)), 6).as("avg_hist3"))
    },

    // Exact media dedup by content digest (differential-tested): the
    // image/audio dedup a multimodal pipeline runs before any decode —
    // group on md5 of the raw payload BYTES, keep the lowest id. One
    // shuffle keyed by the 128-bit digest, never the payload itself
    // (project-before-shuffle: at 100 TB the digest is computed scan-local
    // and the binary column stays in place). The oracle hashes the same
    // bytes via the text column the fixture payloads derive from.
    "q_multimodal_dedup" -> QueryDef.sql(
      "media exact dedup: payload-digest group, keeper + copies + byte mass",
      """SELECT md5(text) AS digest, MIN(doc_id) AS keeper,
        |  COUNT(*) AS n_copies,
        |  CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, dir) =>
      Multimodal.mediaTable(s, dir).toDF()
        .groupBy(md5(col("payload")).as("digest"))
        .agg(min("media_id").as("keeper"), count(lit(1)).as("n_copies"),
          sum(length(col("payload"))).cast("long").as("total_bytes"))
    }
  )
}
