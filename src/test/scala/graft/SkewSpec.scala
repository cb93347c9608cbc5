package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salting equivalence + plan shape on an adversarially skewed fixture:
  * one key owns half the rows. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 10k rows, key 0 holds 5k of them; values vary per row
  private lazy val fact = spark.range(10000L)
    .select((when(col("id") < 5000, 0L).otherwise(col("id") % 97)).as("k"),
      (col("id") * 7 % 1001).as("v"))
  private lazy val dim = (0L until 97L).map(k => (k, s"name$k")).toDF("k", "k_name")

  test("salted join equals the plain join on a skewed key") {
    val plain = fact.join(dim, Seq("k")).select("k", "v", "k_name")
    val salted = Skew.saltedJoin(fact, dim, "k", 8).select("k", "v", "k_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0 && plain.exceptAll(salted).count() == 0)
  }

  test("salted join spreads the hot key over (key, salt) partitions") {
    val plan = Skew.saltedJoin(fact, dim, "k", 8).queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt column absent from join plan:\n$plan")
  }

  test("AQE splits the skewed join partition at runtime (skew=true)") {
    // the automatic path the manual salting backstops: with skew-join
    // thresholds scaled to the fixture, AQE must detect the hot key 0
    // partition after the shuffle and split it — the executed plan's
    // sort-merge join carries the skew=true marker
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // widen the hot rows so key 0's post-shuffle partition crosses the
      // 16KB skew threshold while the median partition stays tiny
      val wideFact = fact.withColumn("pad", lpad(col("v").cast("string"), 64, "x"))
      // keep pad in the OUTPUT or column pruning strips it from the
      // shuffle and the partition-byte skew disappears with it
      val joined = wideFact.join(dim, Seq("k")).select("k", "v", "k_name", "pad")
      // collect() drives THIS Dataset's memoized queryExecution, so the
      // adaptive plan below is the executed (final) one — count() would
      // execute a different derived plan and leave this one un-run
      assert(joined.collect().length == 10000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-key join partition as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("two-stage salted aggregate equals the direct aggregate") {
    val direct = fact.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"),
        min("v").as("mn"), max("v").as("mx"))
    val salted = Skew.saltedAggregate(fact, Seq("k"), 8, Seq(
      Skew.countAll("n"), Skew.sumOf(col("v"), "sv"),
      Skew.minOf(col("v"), "mn"), Skew.maxOf(col("v"), "mx")))
    assert(salted.exceptAll(direct).count() == 0 && direct.exceptAll(salted).count() == 0)
  }
}
