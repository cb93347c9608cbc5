package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Regenerates the frozen golden-result parquets for every
  * [[QueryDef.golden]] query (the secp256k1-parse family DuckDB cannot
  * recompute). Run ONCE after an intentional behavioral change, at the
  * driver's correctness SF:
  *
  *   sbt "runMain graft.GoldenGen /root/testdata/sf0.01"
  *
  * Each query's result is written as a SINGLE parquet file at
  * `QueryDef.goldenDir/<name>.parquet`, which the driver's DuckDB oracle
  * reads verbatim (`QueryDef.goldenOracle`). The queries are deterministic
  * (fixture rows are pure functions of the row index; the one aggregate,
  * q_mempool_analyze, sums longs only), so a regenerated file is
  * bit-stable run-to-run. GoldenParitySpec asserts the live engine still
  * reproduces these files exactly.
  */
object GoldenGen {
  /** Golden query names, derived from the oracle shape so the registry
    * cannot drift from SparkEntry. */
  def goldenNames: Seq[String] =
    SparkEntry.all.collect {
      case (k, QueryDef(_, Some(o), _)) if o == QueryDef.goldenOracle(k) => k
    }.toSeq

  /** Frozen fixture INPUT tables for the SQL-derived merge-family oracles
    * (MempoolParse.mergeCtes): DuckDB cannot regenerate these (their hashes
    * are keccak outputs), so the generator freezes them alongside the parse
    * golden and GoldenParitySpec gates their drift like any golden. */
  def inputGoldens: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    Map(
      "in_sourcelog" -> ((s, dir) => queries.MempoolParse.sourcelog(s, dir)),
      "in_blocks"    -> ((s, dir) => queries.MempoolParse.blocks(s, dir)))

  /** Goldens are only valid at this SF: query row counts scale with the SF
    * parsed from the data dir, so generating or comparing at any other SF
    * silently invalidates every frozen hash. */
  val frozenSf = "sf0.01"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(s"/root/testdata/$frozenSf")
    require(Paths.get(sfDir).getFileName.toString == frozenSf,
      s"goldens are frozen at $frozenSf; refusing to regenerate from $sfDir " +
        "(would invalidate every frozen hash against the driver's verify SF)")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val outRoot = Paths.get(QueryDef.goldenDir)
    Files.createDirectories(outRoot)
    def freeze(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = outRoot.resolve(s".$name.tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = scala.util.Using.resource(Files.list(tmp)) { files =>
        files.filter(_.getFileName.toString.endsWith(".parquet"))
          .findFirst().orElseThrow(() => new IllegalStateException(
            s"golden '$name': no part file written under $tmp"))
      }
      Files.move(part, outRoot.resolve(s"$name.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      // best-effort temp cleanup (part file already moved out)
      scala.util.Using.resource(Files.walk(tmp)) { walk =>
        walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
      }
      val n = spark.read.parquet(outRoot.resolve(s"$name.parquet").toString).count()
      println(s"[golden] $name: $n rows -> ${outRoot.resolve(s"$name.parquet")}")
    }
    goldenNames.foreach(name => freeze(name, SparkEntry.all(name).fn(spark, sfDir)))
    inputGoldens.foreach { case (name, fn) => freeze(name, fn(spark, sfDir)) }
    spark.stop()
  }
}
