package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Input readers for the reference's file layouts (SURVEY.md §2.1 S1-S3):
  * fixed schemas, PERMISSIVE parse + explicit validity filters replacing the
  * reference's line-by-line skip logic (common/txsfile.go:84-148). Spark
  * reads `.csv` and `.csv.gz` natively (gz via codec inference); `.zip`
  * archives go through the streaming per-task decoder in [[readTxCsvZip]].
  */
object Sources {

  /** S1: collector transactions CSV — timestamp_ms,hash,raw_tx_hex, no
    * header (FIXTURES.md §A2). */
  val txCsvSchema: StructType = StructType(Seq(
    StructField("timestamp_ms", LongType),
    StructField("hash", StringType),
    StructField("raw_tx_hex", StringType)))

  /** S3: sourcelog CSV — timestamp_ms,hash,source. */
  val sourcelogCsvSchema: StructType = StructType(Seq(
    StructField("timestamp_ms", LongType),
    StructField("hash", StringType),
    StructField("source", StringType)))

  /** S3: trash CSV — timestamp_ms,hash,source,reason,notes. */
  val trashCsvSchema: StructType = StructType(Seq(
    StructField("timestamp_ms", LongType),
    StructField("hash", StringType),
    StructField("source", StringType),
    StructField("reason", StringType),
    StructField("notes", StringType)))

  private def validHash(c: org.apache.spark.sql.Column) =
    length(c) === 66 && c.rlike("^0x[0-9a-f]{64}$")

  /** P5: source-name normalization (common/consts.go:27-42): map known
    * provider URIs to their short tags, pass anything else through. */
  def normalizeSource(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c.contains("alchemy.com/"), "alchemy")
      .when(c.contains("infura.io/"), "infura")
      .otherwise(c)

  /** F3/P10/P11 row policy: malformed rows are dropped, like the
    * reference's `continue` branches — bad int → null → filtered. */
  def readTxCsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read.schema(txCsvSchema).option("mode", "PERMISSIVE")
      .csv(paths: _*)
      .withColumn("hash", lower(col("hash")))
      .filter(col("timestamp_ms").isNotNull && validHash(col("hash")) &&
        col("raw_tx_hex").isNotNull)

  def readSourcelogCsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read.schema(sourcelogCsvSchema).option("mode", "PERMISSIVE")
      .csv(paths: _*)
      .withColumn("hash", lower(col("hash")))
      .filter(col("timestamp_ms").isNotNull && validHash(col("hash")) &&
        col("source").isNotNull)

  def readTrashCsv(spark: SparkSession, paths: String*): DataFrame =
    spark.read.schema(trashCsvSchema).option("mode", "PERMISSIVE")
      .csv(paths: _*)
      .withColumn("hash", lower(col("hash")))
      .filter(col("timestamp_ms").isNotNull && validHash(col("hash")))

  /** J2 input: hashes from previous-day metadata CSVs (column 1;
    * common/txsfile.go:212-239). Headers are skipped by the hash-validity
    * filter itself — positional, schema-free, like the reference. */
  def readMetadataHashes(spark: SparkSession, paths: String*): DataFrame =
    spark.read.csv(paths: _*)
      .select(lower(col("_c1")).as("hash"))
      .filter(validHash(col("hash")))
      .distinct()

  /** S2: CSV-in-ZIP ingestion (common/txsfile.go:46-68 behavior): iterate
    * the `.csv` members of each `.csv.zip` archive. Spark has no zip codec,
    * so the glob is expanded driver-side (the same FileSystem listing any
    * scan does) and each archive is opened per-task through a STREAMING
    * `ZipInputStream` — one task per archive, matching the reference's
    * per-file iteration, parallel across archives (the daily layout is
    * many hourly zips), and bounded memory: lines flow through a lazy
    * Iterator, so a multi-GB archive never materializes as one byte
    * array (the r1 version buffered whole archives via binaryFile). */
  def readTxCsvZip(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val glob = new org.apache.hadoop.fs.Path(pathGlob)
    val fs = glob.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(glob)).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getPath.toString).toSeq.sorted
    val lines = spark.createDataset(files)
      .repartition(math.max(files.size, 1))
      .flatMap { pathStr =>
        val path = new org.apache.hadoop.fs.Path(pathStr)
        // default hadoop conf in the task: correct for posix/defaultFS
        // paths; a cluster with custom FS settings would broadcast the
        // driver conf instead
        val raw = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
          .open(path)
        val zin = new java.util.zip.ZipInputStream(
          new java.io.BufferedInputStream(raw))
        // lazy line iterator across the archive's .csv members; a fresh
        // Reader per member is safe because ZipInputStream bounds reads
        // at the entry boundary, so no buffered bytes cross entries
        new Iterator[String] {
          private var rd: java.io.BufferedReader = null
          private var nxt: String = null
          private var done = false
          private def nextCsvEntry(): Unit = {
            var e = zin.getNextEntry
            while (e != null && (e.isDirectory || !e.getName.endsWith(".csv")))
              e = zin.getNextEntry
            if (e == null) { zin.close(); done = true }
            else rd = new java.io.BufferedReader(
              new java.io.InputStreamReader(zin, "UTF-8"))
          }
          private def advance(): Unit =
            while (nxt == null && !done) {
              if (rd == null) nextCsvEntry()
              else {
                nxt = rd.readLine()
                if (nxt == null) rd = null // member exhausted; next entry
              }
            }
          def hasNext: Boolean = { advance(); nxt != null }
          def next(): String = {
            if (!hasNext) throw new NoSuchElementException
            val r = nxt; nxt = null; r
          }
        }
      }
    val cols = split(col("value"), ",")
    lines.toDF("value")
      .select(
        element_at(cols, 1).cast("long").as("timestamp_ms"),
        lower(element_at(cols, 2)).as("hash"),
        element_at(cols, 3).as("raw_tx_hex"))
      .filter(col("timestamp_ms").isNotNull && validHash(col("hash")) &&
        col("raw_tx_hex").isNotNull)
  }

  /** S4: typed parquet archive scan with optional row cap
    * (cmd/analyze/main.go:81-107 MAX semantics). The archive's
    * TIMESTAMP_MILLIS columns come back as epoch-ms longs, the shape all
    * downstream operators use. */
  def readArchive(spark: SparkSession, path: String, max: Option[Int] = None): DataFrame = {
    val df0 = spark.read.parquet(path)
    val df = df0.schema.fields.foldLeft(df0) { (d, f) =>
      if (f.dataType == TimestampType) d.withColumn(f.name, unix_millis(col(f.name)))
      else d
    }
    max.fold(df)(df.limit)
  }

  /** Fixed schema for JSONL training-corpus documents — same shape as the
    * documents parquet table (doc_id, text, lang, source, n_chars). */
  val documentsJsonlSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Training-corpus JSONL reader (corpora ship as JSON-lines, one doc per
    * line, commonly gzip'd — Spark infers the codec from the extension).
    * Fixed schema, NO inference (a schema-inference pass would read the
    * whole 100 TB corpus twice); malformed lines follow the same
    * drop-don't-fail policy as the CSV readers (F3), with the raw line
    * kept in `_corrupt_record` for a dead-letter side-channel until the
    * caller drops it. Returns only valid rows. */
  def readDocumentsJsonl(spark: SparkSession, paths: String*): DataFrame =
    spark.read
      .schema(documentsJsonlSchema.add(StructField("_corrupt_record", StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)
      .filter(col("_corrupt_record").isNull &&
        col("doc_id").isNotNull && col("text").isNotNull)
      .drop("_corrupt_record")
}
