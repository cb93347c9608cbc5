package graft.queries

import graft.QueryDef
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column queries (decode stubbed; plumbing real). */
object MultimodalOps {
  val defs: Map[String, QueryDef] = Map(
    "q_multimodal_features" -> QueryDef.rowsOnly(
      "binary media column → per-partition batch decode (stub) → features") {
      (s, dir) => Multimodal.featuresDF(s, dir)
    },
    "q_multimodal_stats" -> QueryDef.rowsOnly(
      "media features rollup per media_type") { (s, dir) =>
      Multimodal.featuresDF(s, dir)
        .groupBy("media_type")
        .agg(count(lit(1)).as("n"),
          sum("n_bytes").as("total_bytes"),
          round(avg("hist_3"), 6).as("avg_hist3"))
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
