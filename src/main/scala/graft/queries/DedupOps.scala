package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fuzzy-dedup operators for the training-data pipeline: MinHash+LSH,
  * SimHash, blocked n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: every operator is candidate-generation (LSH bands /
  * blocking) followed by exact verification on candidates only — the only
  * all-pairs work happens inside buckets. Everything is Spark built-ins
  * (higher-order array functions + hash), fully codegen'd; no UDFs.
  */
object DedupOps {

  /** Word 3-shingle set of `text` (lowercased, distinct). */
  private def shingles(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - 3, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(3)))))
  }

  /** docs ∪ deterministic near-dup copies (last two words dropped,
    * doc_id + 1,000,000) so recall is testable at any SF. */
  private def withPlanted(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val words = split(trim(col("text")), "\\s+")
    val perturbed = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      concat_ws(" ", slice(words, lit(1), greatest(size(words) - 2, lit(1)))).as("text"))
    docs.union(perturbed)
  }

  val defs: Map[String, QueryDef] = Map(

    // MinHash + LSH banding: shingle → 16 minhashes → 4 bands of 4 →
    // band-bucket join → exact Jaccard verify on candidates.
    // Plan shape: shingles are EXPLODED once and the 16 permutation minima
    // run as one codegen'd 16-column hash aggregate (per-row higher-order
    // lambdas are interpreted in Spark and were 3× slower).
    "q_dedup_minhash" -> QueryDef.rowsOnly(
      "MinHash+LSH near-dup: shingle, minhash, band, bucket-join, verify") { (s, dir) =>
      // shingle arrays feed three plan branches (signature agg + two verify
      // joins) — materialize once instead of recomputing the regex split
      val base = withPlanted(s, dir)
        .select(col("doc_id"), shingles(col("text")).as("sh"))
        .cache()
      val exploded = base.select(col("doc_id"), explode(col("sh")).as("s"))
      val minAggs = (0 until 16).map(k => min(xxhash64(col("s"), lit(k))).as(s"mh$k"))
      val sig = exploded.groupBy("doc_id").agg(minAggs.head, minAggs.tail: _*)
      val banded = sig.select(col("doc_id"),
        posexplode(array((0 until 4).map(b =>
          hash((b * 4 until b * 4 + 4).map(k => col(s"mh$k")): _*)): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      val cand = banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      cand
        .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(base.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard_r"))
    },

    // SimHash: per-word 64-bit hashes → bitwise majority fingerprint →
    // 4×16-bit block buckets → hamming-distance verify via bit_count(xor).
    "q_dedup_simhash" -> QueryDef.rowsOnly(
      "SimHash near-dup: majority fingerprint, block buckets, hamming verify") { (s, dir) =>
      // explode words once; the 64 per-bit majority votes run as one
      // codegen'd hash aggregate (64 sum columns) instead of interpreted
      // nested lambdas (30× faster at sf0.1)
      val wordRows = withPlanted(s, dir).select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .select(col("doc_id"), xxhash64(col("w")).as("h"))
      val bitAggs = (0 until 64).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"b$b"))
      val votes = wordRows.groupBy("doc_id").agg(bitAggs.head, bitAggs.tail: _*)
      val sim = (0 until 64).map(b =>
        when(col(s"b$b") >= 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _)
      val fp = votes.select(col("doc_id"), sim.as("simhash"))
      val blocked = fp.select(col("doc_id"), col("simhash"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("simhash"), b * lit(16)).bitwiseAND(0xffffL))))
        .withColumnRenamed("pos", "block").withColumnRenamed("col", "key")
      val a = blocked.select(col("block"), col("key"),
        col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
      val b = blocked.select(col("block"), col("key"),
        col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
      a.join(b, Seq("block", "key"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 12)
    },

    // Blocked exact n-gram Jaccard (differential-tested): char 3-gram sets,
    // all pairs within (lang, source) blocks, relational intersect counts.
    "q_dedup_ngram_jaccard" -> QueryDef.sql(
      "blocked n-gram Jaccard near-dup (char 3-grams, exact)",
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, lang, source, substr(text, i, 3) AS s
        |  FROM documents, generate_series(1, 600) t(i) WHERE i <= length(text) - 2),
        |sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        |  FROM sh a JOIN sh b ON a.s = b.s AND a.lang = b.lang
        |    AND a.source = b.source AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b, round(i * 1.0 / (x.n + y.n - i), 6) AS jaccard_r
        |FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
        |WHERE i * 1.0 / (x.n + y.n - i) >= 0.7""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val sh2 = docs.select(col("doc_id"), col("lang"), col("source"),
        explode(array_distinct(transform(
          sequence(lit(1), greatest(length(col("text")) - 2, lit(0))),
          i => col("text").substr(i, lit(3))))).as("s"))
      val sz = sh2.groupBy("doc_id").agg(count(lit(1)).as("n"))
      // shingle-equality self-join: pair-match volume dominates either way,
      // and this shape avoids building O(block²) posting-pair arrays per row
      val a = sh2.select(col("lang"), col("source"), col("s"), col("doc_id").as("doc_a"))
      val b = sh2.select(col("lang"), col("source"), col("s"), col("doc_id").as("doc_b"))
      val inter = a.join(b, Seq("lang", "source", "s"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("i"))
      val j = inter
        .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
        .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
        .withColumn("jaccard", col("i") * 1.0 / (col("na") + col("nb") - col("i")))
      j.filter(col("jaccard") >= 0.7)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard_r"))
    },

    // Embedding-cosine near-dup (differential-tested): blocked all-pairs
    // with exact decimal dot products so Spark and DuckDB agree bitwise.
    "q_dedup_embedding_cos" -> QueryDef.sql(
      "embedding cosine near-dup, blocked, exact decimal accumulation",
      """WITH flat AS (
        |  SELECT vec_id, label, vec_id // 100 AS block, i,
        |    CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |nrm AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,12))) AS n2 FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS dot
        |  FROM flat a JOIN flat b ON a.label = b.label AND a.block = b.block
        |    AND a.i = b.i AND a.vec_id < b.vec_id
        |  GROUP BY 1, 2)
        |SELECT vec_a, vec_b,
        |  round(CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))), 6) AS cos_r
        |FROM dots JOIN nrm x ON vec_a = x.vec_id JOIN nrm y ON vec_b = y.vec_id
        |WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(x.n2 AS DOUBLE)) * sqrt(CAST(y.n2 AS DOUBLE))) >= 0.25""".stripMargin) { (s, dir) =>
      val flat = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), (col("vec_id") / 100).cast("long").as("block"),
          posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("block"),
          (col("pos") + 1).as("i"), col("col").cast("double").as("v"))
      val nrm = flat.groupBy("vec_id")
        .agg(sum((col("v") * col("v")).cast(DecimalType(28, 12))).as("n2"))
      val a = flat.select(col("label"), col("block"), col("i"),
        col("vec_id").as("vec_a"), col("v").as("va"))
      val b = flat.select(col("label"), col("block"), col("i"),
        col("vec_id").as("vec_b"), col("v").as("vb"))
      val dots = a.join(b, Seq("label", "block", "i"))
        .filter(col("vec_a") < col("vec_b"))
        .groupBy("vec_a", "vec_b")
        .agg(sum((col("va") * col("vb")).cast(DecimalType(28, 12))).as("dot"))
      val cos = dots
        .join(nrm.select(col("vec_id").as("vec_a"), col("n2").as("na")), Seq("vec_a"))
        .join(nrm.select(col("vec_id").as("vec_b"), col("n2").as("nb")), Seq("vec_b"))
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
      cos.filter(col("cos") >= 0.25)
        .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos_r"))
    }
  )
}
