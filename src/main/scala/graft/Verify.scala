package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. Optional extra
  * args restrict the run to the named queries (dev loop). */
object Verify {
  /** Queries whose oracle reads a frozen golden parquet (the golden
    * family and the mergeCtes re-derivations over frozen input tables):
    * valid only at [[GoldenGen.frozenSf]] — at any other SF they are
    * skipped with a self-explaining marker instead of producing opaque
    * hash-mismatch rows. */
  private[graft] def goldenSkipSet(sfName: String): Set[String] =
    if (sfName == GoldenGen.frozenSf) Set.empty
    else SparkEntry.oracleSql.collect {
      case (k, sql) if sql.contains(QueryDef.goldenDir) => k
    }.toSet

  /** Delete a stale `$outDir/$name` result directory. Symmetric with the
    * success branch deleting stale `_error` markers: a skip/failure must
    * not leave BOTH a (previous run's) result parquet and an error marker
    * for one query, or the driver could score the stale result
    * (ADVICE r11). */
  private def deleteResultDir(path: java.nio.file.Path): Unit =
    if (Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      Files.walk(path).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    // load context (VERDICT r13 item 7, same self-labeling Bench carries):
    // a verify run that overlaps other heavy JVMs times out / runs slow
    // for reasons that are not defects — record the signal with the run
    def loadAvg: Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    val loadStart = loadAvg
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // GoldenGen.main refuses to regenerate off-SF for the same reason
    // this skips: frozen hashes are only meaningful at the frozen SF.
    val sfName = Paths.get(sfDir).getFileName.toString
    val goldenSkip = goldenSkipSet(sfName)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        if (goldenSkip(name)) {
          val msg = s"skipped: golden oracle is frozen at ${GoldenGen.frozenSf}, " +
            s"verify dir is $sfName (a run here would be an SF mismatch, not a defect)"
          System.err.println(s"[verify] $name $msg")
          errors(name) = msg
          deleteResultDir(Paths.get(s"$outDir/$name"))
          Files.writeString(Paths.get(s"$outDir/$name._error"), msg + "\n")
        } else try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          // a marker from a previous failed run into the same outDir must
          // not outlive the fix — success clears it
          Files.deleteIfExists(Paths.get(s"$outDir/$name._error"))
          println(f"[verify] $name ${(System.nanoTime() - t0) / 1e9}%.2fs")
        } catch { case e: Throwable =>
          // A thrown query must leave a visible artifact: without one the
          // driver's CORRECTNESS table silently drops the key and a
          // regression reads as "not run" (this hid r9's 18-query break).
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
          errors(name) = s"${e.getClass.getName}: ${e.getMessage}"
          deleteResultDir(Paths.get(s"$outDir/$name"))
          Files.writeString(Paths.get(s"$outDir/$name._error"), errors(name) + "\n")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    // one-line summary with the contended self-label — THE shared rule
    // (Bench.contendedLabel; VERDICT r15 item 3: the previous inline
    // copy here had already drifted — no contended_by, no exculpation).
    // Verify runs no calibration jobs, so both calibrations are None:
    // the load signals stand un-exculpated, which is exactly the old
    // local[4] rule (a verify's own load is ≤ ~width, so start > 6 or
    // end past width + slack has only ever meant another heavy JVM).
    val loadEnd = loadAvg
    // no scan probes and no canary data here, so the io_credits
    // reclassification can never apply (canariesQuiet = false default) —
    // the third element is always "" and is dropped
    val (contended, contendedBy, _) = Bench.contendedLabel(None, None,
      loadStart, loadEnd, Runtime.getRuntime.availableProcessors(),
      cpus.toInt)
    val nRun = SparkEntry.queries.count { case (name, _) =>
      only.isEmpty || only.contains(name) }
    println(f"""{"metric":"verify","n_queries":$nRun,"n_errors":${errors.size},"contended":$contended,"contended_by":"$contendedBy","load_avg_start":$loadStart%.2f,"load_avg_end":$loadEnd%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
