package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * A warm-up action runs first so JVM/classloader/codegen warm-up isn't
  * billed to whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: a scan + shuffle, plus enough fixture/parse iterations to
    // JIT the RLP/keccak/secp stack — otherwise whichever fixture-driven
    // query happens to run first is billed several seconds of compiler
    // warm-up that belongs to none of them
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      var i = 0L
      while (i < 3000) {
        graft.functions.ParseTx.parseHex(graft.functions.TxFixtures.rawTxHex(i))
        i += 1
      }
    } catch { case _: Throwable => }

    val results = SparkEntry.all.toSeq.map { case (name, d) =>
      val t0 = System.nanoTime()
      val ok = try { d.fn(spark, sfDir).count(); true }
      catch { case _: Throwable => false }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
