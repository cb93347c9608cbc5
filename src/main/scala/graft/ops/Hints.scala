package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Join-planning hints shared across the jobs and query packs. */
object Hints {

  /** Broadcast hint gated on Catalyst's own size estimate — for dims that
    * DERIVE FROM A SCALING INPUT (a blacklist of keys, the included-tx
    * subset) rather than a bounded reference set. A forced `broadcast()`
    * on such a side bypasses `autoBroadcastJoinThreshold`, so at 100×
    * scale the plan OOMs the driver instead of degrading. When the
    * optimizer's estimate fits under the session threshold we hint;
    * otherwise the plan is left unhinted so join selection (and AQE, from
    * OBSERVED sizes at runtime) picks broadcast vs shuffle. Estimates
    * Catalyst can't derive (defaultSizeInBytes ≈ Long.Max) fail the
    * gate, which is the safe direction.
    *
    * For dims bounded BY CONTRACT (an eval benchmark's fingerprints, a
    * trained centroid table, a query block) a forced hint remains
    * correct — the author knows a bound the optimizer can't see. */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val thr = BigInt(df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (thr > 0 && est <= thr) broadcast(df) else df
  }
}
