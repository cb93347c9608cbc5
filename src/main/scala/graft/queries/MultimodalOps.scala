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
    }
  )
}
