package graft.jobs

import java.nio.file.{Files, Path, Paths}
import scala.collection.immutable.SortedMap
import scala.jdk.CollectionConverters._

/** The archive website build (reference cmd/website/main.go:83-221 +
  * website/htmldata.go): a root index listing the archive's months and a
  * per-month file-listing page (filename link + human-readable size, rows
  * grouped by day with alternating classes and per-day anchors), written
  * as static HTML next to nothing else — the reference templates over an
  * S3 listing; this templates over the published archive layout on any
  * Hadoop-visible filesystem. Upload is out of scope offline (the
  * reference shells out to its S3 scripts).
  *
  * Listing sources, both supported:
  *  - the flat per-day publish the reference's upload script produces
  *    (`2023-08-29.parquet`, `2023-08-29.csv.zip`, …)
  *  - the `day=yyyy-MM-dd/` partition layout [[graft.ops.Sinks
  *    .writeDailyArchive]] writes — each day partition surfaces as
  *    `<day>.parquet` with the partition's summed bytes, the shape the
  *    upload publishes it as.
  *
  * Driver-side by design like the reference tool: the input is a storage
  * LISTING (one entry per published file — hundreds of rows per year),
  * not data.
  */
object ArchiveSite {

  final case class FileEntry(filename: String, size: Long, modifiedMs: Long)

  private val dayRe = "^(20\\d{2}-\\d{2}-\\d{2}).*".r // pattern-match anchors fully
  private val partRe = "^day=(20\\d{2}-\\d{2}-\\d{2})$".r

  /** Months → file entries, sorted both levels (cmd/website/main.go sorts
    * by the S3 listing order, which is lexicographic). */
  def listing(root: String): SortedMap[String, Seq[FileEntry]] = {
    val rootPath = Paths.get(root)
    if (!Files.isDirectory(rootPath)) return SortedMap.empty
    val entries = Files.list(rootPath)
    val collected =
      try entries.iterator().asScala.flatMap { p =>
        val name = p.getFileName.toString
        name match {
          case partRe(day) if Files.isDirectory(p) =>
            // a day partition publishes as one parquet artifact
            val parts = Files.list(p)
            val (size, mtime) =
              try parts.iterator().asScala
                .filter(f => f.getFileName.toString.startsWith("part-"))
                .foldLeft((0L, 0L)) { case ((s, m), f) =>
                  (s + Files.size(f),
                    math.max(m, Files.getLastModifiedTime(f).toMillis))
                }
              finally parts.close()
            if (size > 0) Some(FileEntry(s"$day.parquet", size, mtime)) else None
          case dayRe(_) if Files.isRegularFile(p) &&
              !name.endsWith(".csv.gz") => // the listing skips .csv.gz (main.go:268)
            Some(FileEntry(name, Files.size(p),
              Files.getLastModifiedTime(p).toMillis))
          case _ => None
        }
      }.toSeq
      finally entries.close()
    SortedMap.empty[String, Seq[FileEntry]] ++
      collected.groupBy(_.filename.take(7)) // yyyy-MM
        .view.mapValues(_.sortBy(_.filename)).toMap
  }

  /** S3-style human size (common/utils.go:140-147: IEC scaling relabeled
    * KB/MB/GB): one decimal under 10 units, none above. Like go-humanize,
    * the value is rounded to ONE decimal before the <10 branch, so the
    * boundary case 9.96 MB prints "10 MB", not "10.0 MB". */
  def humanBytes(n: Long): String = {
    val units = Seq("KB", "MB", "GB", "TB", "PB")
    if (n < 1024) s"$n B"
    else {
      var v = n.toDouble
      var u = -1
      while (v >= 1024 && u < units.length - 1) { v /= 1024; u += 1 }
      val r = math.floor(v * 10 + 0.5) / 10
      if (r < 10) f"$r%.1f ${units(u)}" else f"$r%.0f ${units(u)}"
    }
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  private def page(title: String, body: String): String =
    s"""<!doctype html>
       |<html lang="en">
       |<head>
       |<meta charset="utf-8">
       |<title>${esc(if (title.isEmpty) "Mempool Archive" else title)}</title>
       |</head>
       |<body>
       |$body
       |</body>
       |</html>
       |""".stripMargin

  /** Root page: the month index (templates/index_root.html content block). */
  def renderRoot(months: Seq[String], network: String = "Ethereum Mainnet"): String = {
    val dir = networkDir(network)
    val items = months.map { m =>
      s"""<li><a href="$dir/$m/index.html">${esc(m)}</a></li>"""
    }.mkString("\n")
    page("", s"""<h2>${esc(network)}</h2>\n<ul>\n$items\n</ul>""")
  }

  /** Month page: the file table (templates/index_files.html content
    * block): `../` row, one row per file with a filename anchor+link and
    * the human size, day-grouped alternating `f-even`/`f-odd` classes
    * with a `c1` marker and day anchor on each day's first row. */
  def renderMonth(month: String, files: Seq[FileEntry],
      network: String = "Ethereum Mainnet"): String = {
    val rows = new StringBuilder(
      s"""<tr class="cx"><td class=fn><a href=/index.html>../</a></td><td></td></tr>\n""")
    var day = ""
    var cls = "even"
    files.foreach { f =>
      val dayTmp = f.filename.take(10)
      val change = day != dayTmp
      if (change) {
        day = dayTmp
        cls = if (cls == "even") "odd" else "even"
      }
      val anchors =
        (if (change) s"""<a name="${esc(dayTmp)}"></a>""" else "") +
          s"""<a name="${esc(f.filename)}"></a>"""
      rows.append(
        s"""<tr class="f-$cls ${if (change) "c1" else "c"}">""" +
          s"""<td class=fn>$anchors<a href="${esc(f.filename)}">${esc(f.filename)}</a></td>""" +
          s"""<td class=fs>${humanBytes(f.size)}</td></tr>\n""")
    }
    page(month,
      s"""<a href=/index.html>${esc(network)}</a>\n<h2>${esc(month)}</h2>\n""" +
        s"""<table>\n<tbody>\n$rows</tbody>\n</table>""")
  }

  /** "Ethereum Mainnet" → "ethereum/mainnet" (the reference's publish
    * prefix, cmd/website/main.go:101). */
  private def networkDir(network: String): String =
    network.toLowerCase.split("\\s+").mkString("/")

  /** Build the whole site: root index + one page per month, mirroring the
    * reference's output tree (`index.html`,
    * `ethereum/mainnet/<month>/index.html`). Returns the written paths. */
  def build(archiveRoot: String, outDir: String,
      network: String = "Ethereum Mainnet"): Seq[Path] = {
    val byMonth = listing(archiveRoot)
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val dir = networkDir(network)
    val rootFile = out.resolve("index.html")
    Files.writeString(rootFile, renderRoot(byMonth.keys.toSeq, network))
    rootFile +: byMonth.toSeq.map { case (month, files) =>
      val d = out.resolve(dir).resolve(month)
      Files.createDirectories(d)
      val f = d.resolve("index.html")
      Files.writeString(f, renderMonth(month, files, network))
      f
    }
  }
}

/** CLI: `graft website <archiveDir> <outDir>` (cmd/website/main.go build
  * subcommand; the dev server and S3 upload are out of scope offline). */
object WebsiteJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: website <archiveDir> <outDir>")
    val written = ArchiveSite.build(args(0), args(1))
    written.foreach(p => println(s"[website] wrote $p"))
  }
}
