package graft

import graft.functions.TxFixtures
import graft.jobs.Merge
import graft.ops.{Sinks, Sources}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-to-file pipeline: collector CSV layouts in → merge → archive out,
  * exercising S1/S3 readers against S11/S12 writers. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("collector CSVs -> merge -> parquet archive round-trip") {
    val dir = Files.createTempDirectory("graft-files").toString
    // two tx files with overlap + malformed lines; one sourcelog file
    def txLines(lo: Int, hi: Int): String =
      (lo until hi).map { i =>
        val (ts, hash, raw) = TxFixtures.rawRow(i.toLong)
        s"$ts,$hash,$raw"
      }.mkString("\n")
    Files.writeString(Paths.get(s"$dir/tx1.csv"),
      txLines(0, 120) + "\nshort\nbad,0xnothash,00\n")
    Files.writeString(Paths.get(s"$dir/tx2.csv"), txLines(60, 180))
    Files.writeString(Paths.get(s"$dir/sourcelog.csv"),
      (0 until 180).flatMap(i => TxFixtures.sourcelogRows(i.toLong))
        .map { case (ts, h, src) => s"$ts,$h,$src" }.mkString("\n"))
    // blacklist metadata csv: header + hash col at position 1
    val (_, blHash, _) = TxFixtures.rawRow(3L)
    Files.writeString(Paths.get(s"$dir/meta.csv"),
      s"timestamp_ms,hash,chain_id\n123,$blHash,1\n")

    val raw = Sources.readTxCsv(spark, s"$dir/tx1.csv", s"$dir/tx2.csv")
    assert(raw.count() == 240) // malformed lines dropped (120+120 valid)

    val out = Merge.run(spark, Merge.Inputs(
      rawTxs = raw,
      sourcelog = Sources.readSourcelogCsv(spark, s"$dir/sourcelog.csv"),
      blacklist = Some(Sources.readMetadataHashes(spark, s"$dir/meta.csv"))))
    val txs = out.transactions.cache()
    assert(txs.filter(col("hash") === blHash).count() == 0) // blacklisted
    assert(txs.select("hash").distinct().count() == txs.count())

    Sinks.writeParquetArchive(txs, s"$dir/archive")
    val back = Sources.readArchive(spark, s"$dir/archive")
    assert(back.count() == txs.count())
    assert(Sources.readArchive(spark, s"$dir/archive", max = Some(5)).count() == 5)

    Sinks.writeSourcelogCsv(
      Sources.readSourcelogCsv(spark, s"$dir/sourcelog.csv"), s"$dir/sl_out")
    val slBack = Sources.readSourcelogCsv(spark, s"$dir/sl_out/*.csv")
    assert(slBack.count() > 0)
  }

  test("S2: csv-in-zip archives read identically to plain csv") {
    val dir = Files.createTempDirectory("graft-zip").toString
    val lines = (0 until 80).map { i =>
      val (ts, hash, raw) = TxFixtures.rawRow(i.toLong)
      s"$ts,$hash,$raw"
    }
    Files.writeString(Paths.get(s"$dir/plain.csv"), lines.mkString("\n"))
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(s"$dir/archive.csv.zip"))
    zos.putNextEntry(new java.util.zip.ZipEntry("part1.csv"))
    zos.write(lines.take(50).mkString("\n").getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("part2.csv"))
    zos.write(lines.drop(50).mkString("\n").getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("notes.txt"))
    zos.write("ignore me".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()

    val plain = Sources.readTxCsv(spark, s"$dir/plain.csv")
    val zipped = Sources.readTxCsvZip(spark, s"$dir/archive.csv.zip")
    assert(zipped.count() == plain.count())
    assert(zipped.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(zipped).count() == 0)
  }

  test("JSONL corpus reader: plain + gzip parity with parquet, bad lines dropped") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // round-trip the real table through plain and gzip'd JSON-lines
    docs.coalesce(1).write.mode("overwrite").json(s"$dir/plain")
    docs.coalesce(1).write.mode("overwrite")
      .option("compression", "gzip").json(s"$dir/gz")
    // a file with malformed + schema-violating lines mixed in
    Files.writeString(Paths.get(s"$dir/plain/bad.json"),
      """not json at all
        |{"doc_id": "NaN-ish", "text": 3}
        |{"doc_id": 999999, "text": "ok doc", "lang": "en", "source": "web", "n_chars": 6}
        |""".stripMargin)
    val n = docs.count()
    val plain = graft.ops.Sources.readDocumentsJsonl(spark, s"$dir/plain")
    val gz = graft.ops.Sources.readDocumentsJsonl(spark, s"$dir/gz")
    // the two bad lines vanish, the one valid extra line survives
    assert(plain.count() == n + 1)
    assert(plain.filter(col("doc_id") === 999999L).count() == 1)
    assert(gz.count() == n)
    // field-exact parity with the parquet rows
    assert(gz.exceptAll(docs).count() == 0 && docs.exceptAll(gz).count() == 0)
  }
}
