package graft

import graft.functions.TxFixtures
import graft.streaming.Collect
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Demo driver for the streaming collector: feeds fixture CSV batches,
  * including a late-arriving file and a malformed one, then reports what
  * the sinks wrote. */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val in = Files.createTempDirectory("demo-feed").toString
    val out = Files.createTempDirectory("demo-out").toString

    def feedFile(name: String, lo: Int, hi: Int): Unit =
      Files.writeString(Paths.get(s"$in/$name"), (lo until hi).map { i =>
        val (ts, hash, raw) = TxFixtures.rawRow(i.toLong)
        s"$ts,$hash,$raw,src${i % 3}"
      }.mkString("\n"))

    feedFile("batch1.csv", 0, 150)
    val queries = Collect.run(spark, in, out, Trigger.ProcessingTime(200))
    queries.foreach(_.processAllAvailable())
    println(s"[demo] after batch1: " + count(spark, out))

    // late-arriving batch with 50% duplicates of batch1
    feedFile("batch2.csv", 75, 225)
    // malformed garbage file
    Files.writeString(Paths.get(s"$in/garbage.csv"),
      "not,a,tx\n,,,\n12345,0xzz,nothex,src9\n")
    queries.foreach(_.processAllAvailable())
    println(s"[demo] after batch2+garbage: " + count(spark, out))
    queries.foreach(_.stop())
    println(s"[demo] outDir=$out")
    spark.stop()
  }

  private def count(spark: SparkSession, out: String): String = {
    val tx = try spark.read.schema(
      "timestamp_ms LONG, hash STRING, raw_tx_hex STRING, source STRING")
      .csv(s"$out/transactions/*/*/").count() catch { case _: Exception => 0L }
    val tr = try spark.read.schema(
      "timestamp_ms LONG, hash STRING, source STRING, reason STRING, notes STRING")
      .csv(s"$out/trash").count() catch { case _: Exception => 0L }
    s"transactions=$tx trash=$tr"
  }
}
