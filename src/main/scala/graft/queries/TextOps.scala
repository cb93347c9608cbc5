package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the large-scale training-data pipeline
  * (north-star extensions, SURVEY.md §7.2 step 6): token counting, quality
  * scoring, fingerprinting, exact dedup, and heuristic language ID — all
  * scan-local (no shuffle except the final small group-by), so they scale
  * linearly with input splits at 100 TB.
  */
object TextOps {

  // regex shared verbatim by Spark and DuckDB: word / number / punct tokens
  private val TokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  private val StopRe = "\\b(the|a|an|and|or|of|to|in|is|it)\\b"
  private val PunctRe = "[^A-Za-z0-9\\s]"

  val defs: Map[String, QueryDef] = Map(

    // Whitespace + BPE-ish regex token counting per language.
    "q_text_tokens" -> QueryDef.sql(
      "token counting: whitespace words + regex tokens per lang",
      s"""SELECT lang, COUNT(*) AS n_docs,
         |  CAST(SUM(len(regexp_extract_all(text, '$TokenRe'))) AS BIGINT) AS n_tokens,
         |  CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_words,
         |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM documents GROUP BY lang""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(regexp_extract_all(col("text"), lit(TokenRe), lit(0)))).cast("long").as("n_tokens"),
          sum(size(split(trim(col("text")), "\\s+"))).cast("long").as("n_words"),
          sum("n_chars").cast("long").as("total_chars"))
    },

    // Quality scoring: length / punctuation ratio / stopword ratio buckets.
    "q_text_quality" -> QueryDef.sql(
      "quality scoring: length, punct ratio, stopword ratio",
      s"""SELECT doc_id, length(text) AS n_len,
         |  CAST(len(regexp_extract_all(text, '$PunctRe')) AS BIGINT) AS n_punct,
         |  CAST(len(regexp_extract_all(text, '$StopRe')) AS BIGINT) AS n_stop,
         |  CASE WHEN length(text) >= 200
         |    AND len(regexp_extract_all(text, '$StopRe')) >= 3 THEN 'good'
         |    WHEN length(text) >= 50 THEN 'fair' ELSE 'poor' END AS quality
         |FROM documents""".stripMargin) { (s, dir) =>
      val nStop = size(regexp_extract_all(col("text"), lit(StopRe), lit(0)))
      Tables.documents(s, dir).select(
        col("doc_id"),
        length(col("text")).cast("int").as("n_len"),
        size(regexp_extract_all(col("text"), lit(PunctRe), lit(0))).cast("long").as("n_punct"),
        nStop.cast("long").as("n_stop"),
        when(length(col("text")) >= 200 && nStop >= 3, "good")
          .when(length(col("text")) >= 50, "fair").otherwise("poor").as("quality"))
    },

    // Document fingerprinting: md5 of whitespace-normalized lowercase text
    // (md5 is identical in Spark and DuckDB → differential-testable).
    "q_text_fingerprint" -> QueryDef.sql(
      "document fingerprint: md5 of normalized text + dup counts",
      """SELECT fp, COUNT(*) AS n, min(doc_id) AS keeper FROM (
        |  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\s+', ' '))) AS fp
        |  FROM documents) GROUP BY fp""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fp"))
        .groupBy("fp")
        .agg(count(lit(1)).as("n"), min("doc_id").as("keeper"))
    },

    // Exact dedup: keep lowest doc_id per identical text (hash group-by;
    // at scale this is one shuffle on a 128-bit text digest, not the text).
    "q_dedup_exact" -> QueryDef.sql(
      "exact dedup: earliest doc per identical text",
      """SELECT min(doc_id) AS keeper, COUNT(*) AS n_copies
        |FROM documents GROUP BY md5(text)""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .select("keeper", "n_copies")
    },

    // The composite corpus-preparation pipeline a training-data run chains:
    // quality gate → exact dedup (earliest keeper) → deterministic hash
    // sampling (md5 prefix = the split function both engines share).
    "q_corpus_prepare" -> QueryDef.sql(
      "corpus prep: quality filter → exact dedup → deterministic sample",
      s"""WITH scored AS (
         |  SELECT doc_id, lang, length(text) AS n_len, md5(text) AS h
         |  FROM documents
         |  WHERE length(text) >= 50
         |    AND len(regexp_extract_all(text, '$StopRe')) >= 1),
         |deduped AS (
         |  SELECT min(doc_id) AS doc_id, h FROM scored GROUP BY h)
         |SELECT s.lang, COUNT(*) AS n_docs, CAST(SUM(s.n_len) AS BIGINT) AS total_chars
         |FROM deduped d JOIN scored s ON d.doc_id = s.doc_id AND d.h = s.h
         |WHERE substr(d.h, 1, 1) < '8'
         |GROUP BY s.lang""".stripMargin) { (s, dir) =>
      val scored = Tables.documents(s, dir)
        .filter(length(col("text")) >= 50 &&
          size(regexp_extract_all(col("text"), lit(StopRe), lit(0))) >= 1)
        .select(col("doc_id"), col("lang"), length(col("text")).as("n_len"),
          md5(col("text")).as("h"))
      val deduped = scored.groupBy("h").agg(min("doc_id").as("doc_id"))
      deduped
        .join(scored, Seq("doc_id", "h"))
        .filter(substring(col("h"), 1, 1) < "8") // deterministic ~50% sample
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_len").cast("long").as("total_chars"))
    },

    // Benchmark decontamination (differential-tested): drop every training
    // doc whose exact fingerprint appears in the held-out eval set — the
    // standard test-set-overlap removal step of a training-data pipeline.
    // The eval set is tiny next to the corpus, so its fingerprints
    // BROADCAST and the anti-join never shuffles the training side.
    "q_decontaminate" -> QueryDef.sql(
      "decontamination: drop training docs sharing a fingerprint with the eval set",
      """SELECT d.lang, COUNT(*) AS n_kept,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
        |FROM documents d
        |WHERE d.doc_id % 97 <> 0
        |  AND md5(d.text) NOT IN
        |    (SELECT md5(text) FROM documents WHERE doc_id % 97 = 0)
        |GROUP BY d.lang""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val evalFps = docs.filter(col("doc_id") % 97 === 0)
        .select(md5(col("text")).as("h")).distinct()
      docs.filter(col("doc_id") % 97 =!= 0)
        .withColumn("h", md5(col("text")))
        .join(broadcast(evalFps), Seq("h"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum("n_chars").cast("long").as("total_chars"))
    },

    // Stratified sampling (differential-tested): a deterministic per-
    // language quota — rank docs inside each language by a hash of their
    // id and keep the first K. This is the data-mixing primitive (equal
    // representation per stratum); hash order makes the sample stable
    // across runs and engines. One shuffle on the stratum key; the
    // rank-window is per-stratum, so skewed strata can be salted.
    "q_sample_stratified" -> QueryDef.sql(
      "stratified sampling: deterministic hash-ranked per-language quota",
      """SELECT lang, doc_id FROM (
        |  SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 40""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, dir)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .filter(col("rk") <= 40)
        .select("lang", "doc_id")
    },

    // Repetition signals (the Gopher-style quality gates): per-doc
    // top-unigram mass fraction and duplicate-bigram fraction, plus the
    // repetitive/clean verdict. Everything is scan-local (explode + per-doc
    // aggregates, one hash shuffle on doc_id) — linear at 100 TB.
    "q_text_repetition" -> QueryDef.sql(
      "repetition signals: top-word fraction + duplicate-bigram fraction per doc",
      """WITH w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
        |uni AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
        |          CAST(MAX(c) AS BIGINT) AS top_c FROM wc GROUP BY doc_id),
        |d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |      FROM documents),
        |bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b
        |       FROM d, generate_series(1, 600) t(i) WHERE i <= len(ws) - 1),
        |bga AS (SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT b) AS n_bg_distinct
        |        FROM bg GROUP BY doc_id)
        |SELECT u.doc_id, u.n_words,
        |  round(top_c * 1.0 / u.n_words, 6) AS top_word_frac,
        |  round(1.0 - n_bg_distinct * 1.0 / n_bg, 6) AS dup_bigram_frac,
        |  CASE WHEN top_c * 1.0 / u.n_words > 0.12
        |    OR 1.0 - n_bg_distinct * 1.0 / n_bg > 0.1
        |    THEN 'repetitive' ELSE 'ok' END AS verdict
        |FROM uni u JOIN bga USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val words = docs.select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      val uni = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_words"), max("c").as("top_c"))
      // bigram rows via the native codegen word_ngrams expression — the
      // equivalent transform/slice lambda chain runs interpreted and
      // measured ~15x slower on the sf0.1 corpus
      graft.functions.GraftFunctions.register(s)
      val bg = docs.select(col("doc_id"),
        explode(graft.functions.TextNgrams.word_ngrams(
          lower(trim(col("text"))), lit(2))).as("b"))
      val bga = bg.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bg"), countDistinct("b").as("n_bg_distinct"))
      val topFrac = col("top_c") * 1.0 / col("n_words")
      val dupFrac = lit(1.0) - col("n_bg_distinct") * 1.0 / col("n_bg")
      uni.join(bga, Seq("doc_id"))
        .select(col("doc_id"), col("n_words"),
          round(topFrac, 6).as("top_word_frac"),
          round(dupFrac, 6).as("dup_bigram_frac"),
          when(topFrac > 0.12 || dupFrac > 0.1, "repetitive")
            .otherwise("ok").as("verdict"))
    },

    // Cross-document duplicate n-gram mass (the exact-substring-dedup
    // signal of Lee et al. 2022 at word-5-gram granularity): for each doc,
    // the fraction of its distinct 5-grams that occur in at least one
    // other document. The global document-frequency side joins on the
    // gram itself — at 100 TB that is one shuffle keyed by a 64-bit
    // xxhash of the gram (unbounded domain, so no broadcast), and the
    // per-doc side is a narrow re-explode, never materialized.
    "q_text_dup_ngrams" -> QueryDef.sql(
      "cross-doc duplicate 5-gram fraction per doc (exact-substring-dedup signal)",
      """WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |g AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS g
        |      FROM d, generate_series(1, 600) t(i) WHERE i <= len(ws) - 4),
        |df AS (SELECT g, COUNT(*) AS df FROM g GROUP BY g)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  round(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
        |    AS shared_frac
        |FROM g JOIN df USING (g) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val grams = Tables.documents(s, dir).select(col("doc_id"),
        explode(array_distinct(graft.functions.TextNgrams.word_ngrams(
          lower(trim(col("text"))), lit(5)))).as("g"))
      val dfreq = grams.groupBy("g").agg(count(lit(1)).as("df"))
      grams.join(dfreq, Seq("g"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_shared"))
        .select(col("doc_id"), col("n_grams"), col("n_shared"),
          round(col("n_shared") * 1.0 / col("n_grams"), 6).as("shared_frac"))
    },

    // Heuristic n-gram language ID: per-language stopword evidence scores,
    // argmax prediction, confusion counts vs the labeled column.
    "q_lang_id" -> QueryDef.sql(
      "language-ID heuristic: stopword n-gram scores -> argmax vs label",
      """SELECT lang, pred, COUNT(*) AS n FROM (
        |  SELECT lang,
        |    CASE
        |      WHEN s_de >= s_en AND s_de >= s_fr THEN 'de'
        |      WHEN s_en >= s_fr THEN 'en' ELSE 'fr' END AS pred
        |  FROM (
        |    SELECT lang,
        |      len(regexp_extract_all(text, '\b(der|die|das|und|ist)\b')) AS s_de,
        |      len(regexp_extract_all(text, '\b(the|and|is|of|to)\b')) AS s_en,
        |      len(regexp_extract_all(text, '\b(le|la|et|est|les)\b')) AS s_fr
        |    FROM documents))
        |GROUP BY lang, pred""".stripMargin) { (s, dir) =>
      val sDe = size(regexp_extract_all(col("text"), lit("\\b(der|die|das|und|ist)\\b"), lit(0)))
      val sEn = size(regexp_extract_all(col("text"), lit("\\b(the|and|is|of|to)\\b"), lit(0)))
      val sFr = size(regexp_extract_all(col("text"), lit("\\b(le|la|et|est|les)\\b"), lit(0)))
      Tables.documents(s, dir)
        .select(col("lang"),
          when(sDe >= sEn && sDe >= sFr, "de")
            .when(sEn >= sFr, "en").otherwise("fr").as("pred"))
        .groupBy("lang", "pred").agg(count(lit(1)).as("n"))
    }
  )
}
