package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew remedies for the cases AQE's runtime skew-join can't see
  * (no runtime stats yet, deterministic plan required, or an aggregation
  * rather than a join): spread one hot key's rows over `buckets` tasks by
  * salting the fat side and replicating the slim side.
  *
  * Result equivalence does not depend on the salt assignment — any
  * row→salt mapping yields the same join/aggregate output — so the salt
  * uses a cheap deterministic hash of the row id.
  */
object Skew {

  private def saltCol(buckets: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(buckets.toLong))

  /** Salted inner equi-join for a skewed LEFT side: left rows are salted
    * into `buckets`; the (small) right side is replicated once per
    * bucket; the join key becomes (key, salt), so a hot key's rows land
    * on `buckets` tasks instead of one straggler. Right-side blowup is
    * |right| × buckets — use for slim dimension sides that are still too
    * big (or too key-skewed) to broadcast outright. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val sl = left.withColumn("__salt", saltCol(buckets))
    val sr = right.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    sl.join(sr, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-stage salted aggregation for algebraic aggregates (count/sum/
    * min/max): stage 1 aggregates on (keys, salt) so the hot key's rows
    * combine on `buckets` reducers; stage 2 merges the partials per key.
    * `aggs` maps output alias → (stage-1 partial over input rows,
    * stage-2 merge over stage-1 partials referenced by alias). */
  final case class SaltedAgg(alias: String, partial: Column, merge: Column)

  def countAll(alias: String): SaltedAgg =
    SaltedAgg(alias, count(lit(1)), sum(col(alias)).cast("long"))
  def sumOf(c: Column, alias: String): SaltedAgg =
    SaltedAgg(alias, sum(c), sum(col(alias)))
  def minOf(c: Column, alias: String): SaltedAgg =
    SaltedAgg(alias, min(c), min(col(alias)))
  def maxOf(c: Column, alias: String): SaltedAgg =
    SaltedAgg(alias, max(c), max(col(alias)))

  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
      aggs: Seq[SaltedAgg]): DataFrame = {
    require(aggs.nonEmpty && buckets > 0)
    val stage1 = df.withColumn("__salt", saltCol(buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial.as(aggs.head.alias),
        aggs.tail.map(a => a.partial.as(a.alias)): _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(aggs.head.merge.as(aggs.head.alias),
        aggs.tail.map(a => a.merge.as(a.alias)): _*)
  }
}
