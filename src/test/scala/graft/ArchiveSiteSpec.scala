package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.jobs.ArchiveSite
import graft.ops.MetricsEndpoint
import graft.streaming.CollectorMetrics

/** The two ops-surface tools that round out the reference's cmd surface:
  * the archive website build (cmd/website/main.go) and the Prometheus
  * `/metrics` scrape endpoint (metrics/metrics.go).
  */
class ArchiveSiteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("humanBytes matches the S3-style listing format") {
    assert(ArchiveSite.humanBytes(512) == "512 B")
    assert(ArchiveSite.humanBytes(2048) == "2.0 KB")
    assert(ArchiveSite.humanBytes(97210118L) == "93 MB")
    assert(ArchiveSite.humanBytes(90896124L) == "87 MB")
    assert(ArchiveSite.humanBytes(787064375L) == "751 MB")
    assert(ArchiveSite.humanBytes(5L * 1024 * 1024 * 1024) == "5.0 GB")
    // go-humanize rounds to one decimal BEFORE the <10 branch: 9.96 MB
    // crosses to "10 MB" (no trailing .0), while 9.94 MB stays "9.9 MB"
    assert(ArchiveSite.humanBytes(10443326L) == "10 MB")
    assert(ArchiveSite.humanBytes(10422190L) == "9.9 MB")
  }

  test("listing groups flat per-day publishes by month and skips .csv.gz") {
    val root = Files.createTempDirectory("site-flat")
    Seq("2023-08-29.parquet", "2023-08-29.csv.zip", "2023-09-01.parquet",
      "2023-08-30.csv.gz", "README.md").foreach { n =>
      Files.writeString(root.resolve(n), "x" * 10)
    }
    val byMonth = ArchiveSite.listing(root.toString)
    assert(byMonth.keys.toSeq == Seq("2023-08", "2023-09"))
    assert(byMonth("2023-08").map(_.filename) ==
      Seq("2023-08-29.csv.zip", "2023-08-29.parquet"))
    assert(byMonth("2023-09").map(_.filename) == Seq("2023-09-01.parquet"))
    assert(byMonth("2023-08").forall(_.size == 10))
  }

  test("day=partition layout surfaces one sized parquet entry per day") {
    val dir = Files.createTempDirectory("site-days").toString
    val df = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-10").cast("timestamp") &&
        col("ts") < lit("2024-01-13").cast("timestamp"))
    graft.ops.Sinks.writeDailyArchive(df, dir, date_format(col("ts"), "yyyy-MM-dd"))
    val byMonth = ArchiveSite.listing(dir)
    assert(byMonth.keys.toSeq == Seq("2024-01"))
    val files = byMonth("2024-01")
    assert(files.map(_.filename) ==
      Seq("2024-01-10.parquet", "2024-01-11.parquet", "2024-01-12.parquet"))
    // sizes are the partitions' real summed bytes
    files.foreach { f =>
      import scala.jdk.CollectionConverters._
      val day = f.filename.stripSuffix(".parquet")
      val onDisk = Files.list(Paths.get(dir, s"day=$day"))
      val expect =
        try onDisk.iterator().asScala
          .filter(_.getFileName.toString.startsWith("part-"))
          .map(Files.size).sum
        finally onDisk.close()
      assert(f.size == expect && f.size > 0)
    }
  }

  test("build writes the reference's output tree with day-grouped rows") {
    val root = Files.createTempDirectory("site-src")
    Seq("2023-08-29.parquet", "2023-08-29.csv.zip", "2023-08-30.parquet",
      "2023-09-01.parquet").foreach { n =>
      Files.writeString(root.resolve(n), "y" * 2048)
    }
    val out = Files.createTempDirectory("site-out").toString
    val written = ArchiveSite.build(root.toString, out)
    assert(written.map(_.toString).toSet == Set(
      s"$out/index.html",
      s"$out/ethereum/mainnet/2023-08/index.html",
      s"$out/ethereum/mainnet/2023-09/index.html"))
    val rootHtml = Files.readString(Paths.get(s"$out/index.html"))
    assert(rootHtml.contains("""<a href="ethereum/mainnet/2023-08/index.html">2023-08</a>"""))
    assert(rootHtml.contains("""<a href="ethereum/mainnet/2023-09/index.html">2023-09</a>"""))
    val aug = Files.readString(Paths.get(s"$out/ethereum/mainnet/2023-08/index.html"))
    // both 08-29 artifacts share a day class; 08-30 flips it; day anchors
    // land on each day's first row only
    assert(aug.contains("""<a href="2023-08-29.parquet">2023-08-29.parquet</a>"""))
    assert(aug.contains("2.0 KB"))
    val clsOf = "<tr class=\"f-(\\w+) (c1?)\">".r
      .findAllMatchIn(aug).map(m => (m.group(1), m.group(2))).toSeq
    assert(clsOf == Seq(("odd", "c1"), ("odd", "c"), ("even", "c1")))
    assert("<a name=\"2023-08-29\"></a>".r.findAllIn(aug).size == 1)
  }

  test("metrics endpoint serves the Prometheus text exposition over HTTP") {
    val m = new CollectorMetrics
    m.add(CollectorMetrics.TxReceived, 41)
    m.add(CollectorMetrics.labeled(CollectorMetrics.TxReceived, "alchemy"), 41)
    m.add(CollectorMetrics.ChBatchSaveSuccess, 3)
    val ep = new MetricsEndpoint(m)
    try {
      val conn = java.net.URI.create(ep.address).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      assert(conn.getContentType.startsWith("text/plain"))
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(body.contains("mempool_dumpster_tx_received_total 41"))
      assert(body.contains("""mempool_dumpster_tx_received_total{source="alchemy"} 41"""))
      assert(body.contains("mempool_dumpster_clickhouse_batch_save_success_total 3"))
      // counters move between scrapes
      m.add(CollectorMetrics.TxReceived, 1)
      val conn2 = java.net.URI.create(ep.address).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val body2 = new String(conn2.getInputStream.readAllBytes(), "UTF-8")
      assert(body2.contains("mempool_dumpster_tx_received_total 42"))
      // non-GET refused
      val conn3 = java.net.URI.create(ep.address).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn3.setRequestMethod("POST")
      conn3.setDoOutput(true)
      conn3.getOutputStream.write(Array[Byte](1))
      assert(conn3.getResponseCode == 405)
      // health probes (reference api/server.go:51-58): 200 "ok"; routes
      // outside the mounted contexts stay 404
      val base = ep.address.stripSuffix("/metrics")
      def get(route: String): (Int, String) = {
        val c = java.net.URI.create(base + route).toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        val code = c.getResponseCode
        val body = if (code == 200)
          new String(c.getInputStream.readAllBytes(), "UTF-8") else ""
        (code, body)
      }
      assert(get("/livez") == (200, "ok"))
      assert(get("/readyz") == (200, "ok"))
      assert(get("/nope")._1 == 404)
    } finally ep.close()
    // closed endpoint refuses connections
    intercept[java.io.IOException] {
      val c = java.net.URI.create(ep.address).toURL
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setConnectTimeout(1000)
      c.getResponseCode
    }
    ()
  }
}
