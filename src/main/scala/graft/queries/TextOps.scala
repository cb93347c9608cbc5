package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for the large-scale training-data pipeline
  * (north-star extensions, SURVEY.md §7.2 step 6): token counting, quality
  * scoring, fingerprinting, exact dedup, and heuristic language ID — all
  * scan-local (no shuffle except the final small group-by), so they scale
  * linearly with input splits at 100 TB.
  */
object TextOps {

  // regex shared verbatim by Spark and DuckDB: word / number / punct tokens
  private val TokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  private[graft] val StopRe = "\\b(the|a|an|and|or|of|to|in|is|it)\\b"
  private val PunctRe = "[^A-Za-z0-9\\s]"

  /** PII scrubbing alternation (email | phone-shaped | long digit run) —
    * the same pattern string compiles identically under Java regex (Spark)
    * and RE2 (DuckDB), so the redaction is differential-testable. The
    * classes are deliberately simple (no lookaround — RE2 has none). */
  val PiiRe: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" + // email
      "|\\b[0-9]{2,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{4}\\b" + // phone (xx-xxx-xxx-xxxx)
      "|[0-9]{6,}"                                        // long digit run / account id

  /** Redact every PII match in `c` with the `<PII>` placeholder. Shared by
    * q_pii_redact and the planted-PII spec. */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(c, PiiRe, "<PII>")

  /** The corpus quality-gate predicates, shared by q_filter_funnel and
    * the CorpusBuild job so the differential-tested query and the CLI can
    * never drift apart: minimum length, then stopword evidence. */
  private[graft] def gateMinLength: org.apache.spark.sql.Column =
    length(col("text")) >= 50
  private[graft] def gateStopword: org.apache.spark.sql.Column =
    gateMinLength &&
      size(regexp_extract_all(col("text"), lit(StopRe), lit(0))) >= 1

  /** Water-filling quota allocation — the iterative completion of
    * q_mix_weights' single pass: split `budget` docs equally across
    * strata, give each under-populated stratum everything it has, and
    * re-allocate the freed budget to the rest until fixpoint. Runs on the
    * driver over one tiny aggregate row per stratum (the corpus itself is
    * never touched); ties in the final equal share go to the
    * lexicographically-smallest keys so the result is deterministic.
    *
    * Invariants (property-tested): Σquota = min(budget, Σcounts); no
    * quota exceeds its population; every stratum that did NOT hit its
    * population cap receives within 1 of the max such share. */
  def waterFillQuotas(counts: Map[String, Long], budget: Long): Map[String, Long] = {
    require(counts.values.forall(_ >= 0) && budget >= 0)
    val out = collection.mutable.Map.empty[String, Long]
    var open = counts.filter(_._2 > 0)
    var remaining = math.min(budget, counts.values.sum)
    var settled = false
    while (!settled && open.nonEmpty && remaining > 0) {
      val share = remaining / open.size
      val exhausted = open.filter(_._2 <= share)
      if (exhausted.isEmpty || share == 0) {
        // everyone can absorb the equal share; spread the remainder one
        // doc each to the first keys in sorted order
        val keys = open.keys.toSeq.sorted
        val extra = (remaining % open.size).toInt
        keys.zipWithIndex.foreach { case (k, i) =>
          out(k) = share + (if (i < extra) 1L else 0L)
        }
        remaining = 0
        settled = true
      } else {
        exhausted.foreach { case (k, n) => out(k) = n }
        remaining -= exhausted.values.sum
        open = open -- exhausted.keys
      }
    }
    counts.keys.map(k => k -> out.getOrElse(k, 0L)).toMap
  }

  /** One unrolled BPE-merge round for the q_bpe_train oracle: pair counts
    * over the sentinel-encoded symbol strings, deterministic top pair
    * (count desc, pair asc), greedy left-to-right merge via non-overlapping
    * string replace. Tokens are wrapped `␟tok␟` and concatenated, so the
    * pair pattern `␟a␟␟b␟` can never match across token boundaries and
    * adjacent occurrences never share delimiter characters. */
  private def bpeRoundSql(r: Int): String = {
    val prev = s"w${r - 1}"
    // pair positions come from a PER-ROW series 1..len(ts)-1 (ADVICE r6:
    // the old fixed 100-position cross-join bound silently truncated pair
    // counts for tokens longer than the constant), so the oracle and the
    // uncapped Spark side can never diverge on long tokens
    s"""p$r AS (
       |  SELECT ts[i] || ' ' || ts[i+1] AS pair
       |  FROM (
       |    SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
       |    FROM (SELECT string_split(trim(t, chr(31)), chr(31)||chr(31)) AS ts FROM $prev))),
       |m$r AS (
       |  SELECT string_split(pair, ' ')[1] AS a, string_split(pair, ' ')[2] AS b, pair, n
       |  FROM (SELECT pair, COUNT(*) AS n FROM p$r GROUP BY pair ORDER BY n DESC, pair LIMIT 1)),
       |w$r AS (
       |  SELECT replace(t, chr(31)||a||chr(31)||chr(31)||b||chr(31),
       |                 chr(31)||a||b||chr(31)) AS t
       |  FROM $prev CROSS JOIN m$r)""".stripMargin
  }

  /** The n-round unrolled BPE oracle (w0 seed + rounds CTEs + the learned
    * merge table) — shared by q_bpe_train (3 rounds) and q_bpe_train6. */
  private def bpeOracleSql(rounds: Int): String = {
    val ctes = (1 to rounds).map(bpeRoundSql).mkString(",\n")
    val union = (1 to rounds).map { r =>
      if (r == 1) s"SELECT 1 AS step, pair, a || b AS merged, CAST(n AS BIGINT) AS n FROM m1"
      else s"UNION ALL SELECT $r, pair, a || b, CAST(n AS BIGINT) FROM m$r"
    }.mkString("\n  ")
    s"""WITH ws AS (
       |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents),
       |w0 AS (
       |  SELECT regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g') AS t
       |  FROM ws WHERE length(w) > 0),
       |$ctes
       |SELECT * FROM (
       |  $union)""".stripMargin
  }

  /** Distributed BPE training, rounds parameterized (VERDICT r6 item 6).
    * Per round: one pair-count shuffle with map-side partials, a 1-row
    * driver argmax (driver-scale by construction), and a narrow
    * sentinel-replace applying the merge. Every `checkpointEvery` rounds
    * the symbol column is CHECKPOINTED — reliable checkpoint when the
    * context has a checkpoint dir (the cluster configuration), executor-
    * local otherwise — so the replace-chain lineage depth stays bounded
    * at any round count instead of nesting one plan level per merge (the
    * 100 TB promise the r5 scaladoc made; ScalePlanSpec asserts the final
    * plan holds ≤ checkpointEvery replace levels). Returns (learned
    * merges, final symbol column) so specs can assert the plan shape. */
  /** One training run per (session, dir, rounds) — q_bpe_train and
    * q_bpe_encode consume the same 3-round model, so the per-round argmax
    * action loop must not re-run per consumer. The final symbol column is
    * cached (the encode pass re-reads it); released by Bench after the
    * last consumer and by the session-end sweep. */
  private val bpeMemo = scala.collection.concurrent.TrieMap
    .empty[(Int, String, Int), (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame)]

  /** The shorter model every longer train continues from (q_bpe_train's
    * 3 rounds). BPE is prefix-stable — round r's argmax depends only on
    * the corpus and rounds 1..r−1 — so a 6-round model's first 3 merges
    * ARE the 3-round model, and training them again per model was pure
    * rework (Bench trained 9 rounds for the 3-query family; now 6). */
  private val BpeBaseRounds = 3

  private[graft] def bpeTrained(s: org.apache.spark.sql.SparkSession, dir: String,
      rounds: Int, checkpointEvery: Int = 4)
      : (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) =
    SessionCaches.memoize(bpeMemo, (System.identityHashCode(s), dir, rounds), {
      SessionCaches.onRelease(s, s"text.bpe:$rounds:$dir")(() =>
        releaseBpe(s, dir, rounds))
      val (learned, words) =
        if (rounds > BpeBaseRounds) {
          // continue from the memoized base model: same values as a full
          // train (prefix stability above; checkpoint placement is
          // lineage-neutral), rounds 1..base computed once per session.
          // An early-exhausted base (every word one symbol) is already
          // the fixpoint — a longer train learns nothing more.
          val (lb, wb) = bpeTrained(s, dir, BpeBaseRounds)
          // (the trivial projection keeps this model's cache entry
          // distinct from the base model's, so the two release hooks
          // never unpersist each other's frame)
          if (lb.size < BpeBaseRounds) (lb, wb.select(col("t")))
          else {
            val (lc, wc) = bpeRounds(s, wb,
              (BpeBaseRounds + 1) to rounds, rounds, checkpointEvery)
            (lb ++ lc, wc)
          }
        } else bpeTrain(s, dir, rounds, checkpointEvery)
      val cached = words.cache()
      cached.count() // materialize: two consumers race the lazy fill
      (learned, cached)
    })

  /** Unpersist + evict one trained model; idempotent. */
  def releaseBpe(s: org.apache.spark.sql.SparkSession, dir: String, rounds: Int): Unit =
    bpeMemo.remove((System.identityHashCode(s), dir, rounds))
      .foreach(_._2.unpersist(false))

  /** The corpus CLI's composed [[graft.jobs.CorpusBuild.Result]], memoized
    * per (session, dir) so the driver-visible q_corpus_build oracle and
    * any other consumer share one post-redaction cache; released by Bench
    * after the query and by the session-end sweep. The eval set is the
    * doc_id % 97 == 0 subset — the same convention q_filter_funnel's
    * oracle freezes. */
  private val corpusBuildMemo = scala.collection.concurrent.TrieMap
    .empty[(Int, String), graft.jobs.CorpusBuild.Result]

  private[graft] def corpusBuildResult(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.jobs.CorpusBuild.Result =
    SessionCaches.memoize(corpusBuildMemo, (System.identityHashCode(s), dir), {
      SessionCaches.onRelease(s, s"text.corpusbuild:$dir")(() =>
        releaseCorpusBuild(s, dir))
      val docs = Tables.documents(s, dir)
      graft.jobs.CorpusBuild.run(s, graft.jobs.CorpusBuild.Inputs(
        docs, Some(docs.filter(col("doc_id") % 97 === 0))))
    })

  /** Unpersist + evict the composed corpus-build run; idempotent. */
  def releaseCorpusBuild(s: org.apache.spark.sql.SparkSession, dir: String): Unit =
    corpusBuildMemo.remove((System.identityHashCode(s), dir)).foreach(_.release())

  private[graft] def bpeTrain(s: org.apache.spark.sql.SparkSession, dir: String,
      rounds: Int, checkpointEvery: Int = 4)
      : (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    graft.functions.GraftFunctions.register(s)
    val S = "\u001f" // chr(31) unit separator, absent from the corpus
    val base = Tables.documents(s, dir)
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .select(regexp_replace(col("w"), "(.)", S + "$1" + S).as("t"))
      .cache()
    val (learned, words) =
      bpeRounds(s, base, 1 to rounds, rounds, checkpointEvery)
    base.unpersist()
    (learned, words)
  }

  /** The per-round merge loop of [[bpeTrain]], start-step parameterized
    * so a longer model can CONTINUE from a shorter memoized one (BPE is
    * prefix-stable: the argmax of round r depends only on the corpus and
    * rounds 1..r−1, so a 6-round train's first 3 merges ARE the 3-round
    * model — training them twice was pure rework). */
  private def bpeRounds(s: org.apache.spark.sql.SparkSession,
      words0: org.apache.spark.sql.DataFrame, steps: Range,
      rounds: Int, checkpointEvery: Int)
      : (Seq[(Int, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    val S = "\u001f" // chr(31) unit separator, absent from the corpus
    var words = words0
    var exhausted = false
    val learned = steps.flatMap { step =>
      if (exhausted) None
      else {
        // pair extraction rides the native codegen word_ngrams over the
        // single-space form (tokens cannot contain spaces)
        val sym = call_function("replace",
          trim(col("t"), S), lit(S + S), lit(" "))
        val tops = words
          .select(explode(graft.functions.TextNgrams.word_ngrams(sym, lit(2))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("pair")).limit(1)
          .collect() // ≤ 1 row, driver-scale by construction
        if (tops.isEmpty) {
          // no pair left to merge (every word collapsed to one symbol) —
          // stop with the rules learned so far, matching the DuckDB
          // twin's empty-CTE degradation instead of crashing on (0)
          // (review r17)
          exhausted = true
          None
        } else {
          val top = tops(0)
          val pair = top.getString(0)
          val n = top.getLong(1)
          val Array(a, b) = pair.split(" ", 2)
          words = words.select(call_function("replace", col("t"),
            lit(S + a + S + S + b + S), lit(S + a + b + S)).as("t"))
          if (step % checkpointEvery == 0 && step < rounds)
            words =
              if (s.sparkContext.getCheckpointDir.isDefined) words.checkpoint()
              else words.localCheckpoint()
          Some((step, pair, a + b, n))
        }
      }
    }
    (learned, words)
  }

  val defs: Map[String, QueryDef] = Map(

    // BPE tokenizer TRAINING (differential-tested): the first 3 merge
    // rules learned from the corpus — per round, one distributed pair
    // count over the symbol sequences, a deterministic argmax (count
    // desc, pair asc — a TINY driver-side aggregate, like the water-fill
    // quotas), and a narrow map applying the merge greedily
    // left-to-right. Symbols are sentinel-wrapped (`\u241f`tok`\u241f`
    // concatenated) so the merge is a plain non-overlapping string replace
    // with no cross-token or shared-boundary matches; Spark and DuckDB
    // replace() both scan left-to-right, so the rounds agree exactly. At
    // 100 TB: each round is one scan + one shuffle on the pair key with
    // map-side partial counts (the pair domain is vocab², heavily
    // skew-concentrated — the count fits memory long before the scan
    // ends); [[bpeTrain]] checkpoints the symbol column every few rounds
    // to cap lineage.
    "q_bpe_train" -> QueryDef.sql(
      "BPE tokenizer training: first 3 merges (pair, merged token, support)",
      bpeOracleSql(3)) { (s, dir) =>
      import s.implicits._
      bpeTrained(s, dir, rounds = 3)._1.toDF("step", "pair", "merged", "n")
    },

    // BPE tokenizer APPLICATION (differential-tested): the token
    // vocabulary with frequencies after encoding the corpus with the 3
    // learned merges — i.e. the final symbol stream of the training
    // chain, split back into tokens and counted. Shares the memoized
    // trained model with q_bpe_train (one training run, two consumers);
    // the oracle replays the identical unrolled chain to w3 and counts
    // the same split. At 100 TB the encode pass is one scan of the
    // symbol column plus a token-keyed count with map-side partials.
    "q_bpe_encode" -> QueryDef.sql(
      "BPE tokenizer application: corpus token vocabulary after 3 merges",
      s"""WITH ws AS (
         |  SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w FROM documents),
         |w0 AS (
         |  SELECT regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g') AS t
         |  FROM ws WHERE length(w) > 0),
         |${(1 to 3).map(bpeRoundSql).mkString(",\n")}
         |SELECT token, CAST(COUNT(*) AS BIGINT) AS n
         |FROM (SELECT unnest(string_split(trim(t, chr(31)), chr(31)||chr(31))) AS token
         |      FROM w3)
         |GROUP BY token""".stripMargin) { (s, dir) =>
      val S = "\u001f" // the trainer's sentinel (chr(31))
      val (_, words) = bpeTrained(s, dir, rounds = 3)
      words
        .select(explode(split(call_function("replace",
          trim(col("t"), S), lit(S + S), lit(" ")), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
    },

    // The same trainer past the checkpoint boundary (VERDICT r6 item 6):
    // 6 merge rounds with the symbol column checkpointed every 2, so the
    // verify run EXERCISES the lineage cap (truncations after rounds 2
    // and 4) rather than claiming it; the oracle is the identical chain
    // unrolled to 6 rounds — checkpointing is lineage-neutral, so the
    // hashes must still match. ScalePlanSpec asserts the final symbol
    // plan carries at most checkpointEvery replace levels.
    "q_bpe_train6" -> QueryDef.sql(
      "BPE tokenizer training: 6 merges with lineage checkpoints every 2 rounds",
      bpeOracleSql(6)) { (s, dir) =>
      import s.implicits._
      bpeTrained(s, dir, rounds = 6, checkpointEvery = 2)._1
        .toDF("step", "pair", "merged", "n")
    },

    // Context-window chunking: fixed-size token windows with stride
    // overlap — the pretraining/RAG prep step that turns documents into
    // model-sized pieces while keeping provenance (doc_id, chunk_id).
    // Scan-local: sequence+explode+slice are narrow ops, no shuffle; at
    // 100 TB the chunker runs at read bandwidth and the output partitions
    // inherit the input's. Window 50 tokens, stride 40 (10-token overlap),
    // on the same whitespace tokenization as q_text_tokens.
    "q_text_chunk" -> QueryDef.sql(
      "document chunking: 50-token windows, stride 40, provenance kept",
      """WITH w AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, words, UNNEST(range(0, len(words), 40)) AS start
        |  FROM w)
        |SELECT doc_id, CAST(start // 40 AS BIGINT) AS chunk_id,
        |  CAST(LEAST(50, len(words) - start) AS BIGINT) AS n_tok,
        |  array_to_string(words[start + 1 : start + 50], ' ') AS chunk
        |FROM s
        |WHERE start = 0 OR len(words) - start > 10""".stripMargin) { (s, dir) =>
      // a tail window that adds no tokens beyond the overlap (start >=
      // n - overlap) is fully contained in the previous chunk — drop it,
      // like any standard stride chunker
      Tables.documents(s, dir)
        .select(col("doc_id"), split(trim(col("text")), "\\s+").as("words"))
        .select(col("doc_id"), col("words"),
          explode(sequence(lit(0), size(col("words")) - 1, lit(40))).as("start"))
        .filter(col("start") === 0 || size(col("words")) - col("start") > 10)
        .select(col("doc_id"),
          (col("start") / 40).cast("long").as("chunk_id"),
          least(lit(50), size(col("words")) - col("start")).cast("long").as("n_tok"),
          array_join(slice(col("words"), col("start") + 1, lit(50)), " ").as("chunk"))
    },

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

    // Character-entropy quality signal (differential-tested): Shannon
    // entropy of the per-doc character distribution in nats — the cheap
    // gibberish/repetition gate (binary junk and repeated-char spam score
    // low; natural text sits near 2.6-3.0). Computed as
    // ln(n) − Σ k·ln(k) / n with the per-character terms truncated to
    // exact decimals, so the score is order-independent and bit-equal
    // across engines. Scan-local: one (doc, char) partial aggregate, one
    // doc-keyed reduce — linear at 100 TB.
    "q_text_entropy" -> QueryDef.sql(
      "character entropy per doc (nats) + low-entropy verdict",
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS c
        |            FROM documents WHERE length(text) > 0),
        |cc AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
        |e AS (
        |  SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n,
        |    SUM(CAST(k * ln(CAST(k AS DOUBLE)) AS DECIMAL(28,12))) AS slk
        |  FROM cc GROUP BY doc_id)
        |SELECT doc_id, n AS n_chars_tot,
        |  round(ln(n) - CAST(slk AS DOUBLE) / n, 6) AS entropy_r,
        |  CASE WHEN ln(n) - CAST(slk AS DOUBLE) / n < 2.0
        |    THEN 'low' ELSE 'ok' END AS verdict
        |FROM e""".stripMargin) { (s, dir) =>
      // empty docs carry no character distribution: excluded on BOTH
      // sides (Spark split("", "") yields [""] where DuckDB yields [] —
      // without the guard an empty doc exists only in the Spark result)
      val cc = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
        .groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
      val ent = log(col("n").cast("double")) - col("slk").cast("double") / col("n")
      cc.groupBy("doc_id")
        .agg(sum("k").as("n"),
          sum((col("k") * log(col("k").cast("double")))
            .cast(DecimalType(28, 12))).as("slk"))
        .select(col("doc_id"), col("n").cast("long").as("n_chars_tot"),
          round(ent, 6).as("entropy_r"),
          when(ent < 2.0, "low").otherwise("ok").as("verdict"))
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

    // Data-mixing APPLY (differential-tested): per-language populations →
    // [[waterFillQuotas]] on the driver (one tiny aggregate row per
    // stratum — the corpus is never collected) → the same deterministic
    // hash-ranked draw as q_sample_stratified, with the PER-STRATUM quota
    // the water-fill allocated instead of a flat constant. Completes the
    // q_mix_weights → quota → draw chain; LlmOpsSpec pins the invariants
    // (Σkept = min(budget, N), no stratum over-drawn, under-populated
    // strata taken whole).
    //
    // The oracle expresses the iterative loop in closed form: sorted by
    // population ascending, the exhausted set is the unique prefix j*
    // where n_j ≤ share(j) < n_{j+1} with share(j) = (B − cum_j) div
    // (m − j) — the fixpoint water level. Prefix strata are taken whole;
    // the rest get share, with the remainder spread one each to the
    // lexicographically-smallest open keys. Equivalence to the loop is
    // fuzz-verified (200k random cases) and the sf0.01 hash check pins it.
    "q_sample_mixed" -> QueryDef.sql(
      "data-mixing apply: water-filled per-language quotas drawn by hash rank",
      """WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |par AS (SELECT COUNT(*) AS m,
        |               CAST(LEAST(SUM(n), 200) AS BIGINT) AS b FROM counts),
        |ord AS (
        |  SELECT lang, n,
        |    ROW_NUMBER() OVER (ORDER BY n, lang) AS rn,
        |    CAST(SUM(n) OVER (ORDER BY n, lang
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM counts),
        |cand AS (
        |  SELECT 0 AS j, CAST(0 AS BIGINT) AS cumj FROM par
        |  UNION ALL
        |  SELECT CAST(rn AS INT) AS j, cum AS cumj FROM ord, par WHERE rn < m),
        |pick AS (
        |  SELECT c.j, (p.b - c.cumj) // (p.m - c.j) AS share,
        |         p.b - c.cumj AS rem
        |  FROM cand c CROSS JOIN par p
        |  LEFT JOIN ord oj ON oj.rn = c.j
        |  LEFT JOIN ord oj1 ON oj1.rn = c.j + 1
        |  WHERE (c.j = 0 OR oj.n <= (p.b - c.cumj) // (p.m - c.j))
        |    AND (oj1.n IS NULL OR oj1.n > (p.b - c.cumj) // (p.m - c.j))),
        |pickx AS (
        |  SELECT COALESCE((SELECT j FROM pick), p.m) AS j,
        |         COALESCE((SELECT share FROM pick), 0) AS share,
        |         COALESCE((SELECT rem FROM pick), 0) AS rem,
        |         p.m AS m
        |  FROM par p),
        |q2 AS (
        |  SELECT o.lang, o.n, o.rn, p.j, p.share, p.rem, p.m,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY CASE WHEN o.rn <= p.j THEN 1 ELSE 0 END
        |      ORDER BY o.lang) AS grk
        |  FROM ord o CROSS JOIN pickx p),
        |quotas AS (
        |  SELECT lang,
        |    CASE WHEN rn <= j THEN n
        |         ELSE share + CASE WHEN grk <= rem - share * (m - j)
        |                      THEN 1 ELSE 0 END
        |    END AS quota
        |  FROM q2),
        |ranked AS (
        |  SELECT d.lang, d.doc_id,
        |    ROW_NUMBER() OVER (PARTITION BY d.lang
        |      ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rk
        |  FROM documents d)
        |SELECT r.lang, CAST(MAX(q.quota) AS BIGINT) AS quota,
        |       COUNT(*) AS n_kept
        |FROM ranked r JOIN quotas q ON r.lang = q.lang
        |WHERE r.rk <= q.quota
        |GROUP BY r.lang""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val quotas = waterFillQuotas(counts, budget = 200L)
      val qdf = broadcast(quotas.toSeq.toDF("lang", "quota"))
      docs
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang"))
            .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))))
        .join(qdf, Seq("lang"))
        .filter(col("rk") <= col("quota"))
        .groupBy("lang")
        .agg(max("quota").as("quota"), count(lit(1)).as("n_kept"))
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
        |       FROM (SELECT doc_id, ws,
        |             unnest(generate_series(1, len(ws) - 1)) AS i FROM d)),
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
        |      FROM (SELECT doc_id, ws,
        |            unnest(generate_series(1, len(ws) - 4)) AS i FROM d)),
        |df AS (SELECT g, COUNT(*) AS df FROM g GROUP BY g)
        |SELECT doc_id, COUNT(*) AS n_grams,
        |  CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
        |  round(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
        |    AS shared_frac
        |FROM g JOIN df USING (g) GROUP BY doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      // shuffle key = xxhash64(gram), not the gram string: the DF group-by
      // and the DF-lookup join move 8-byte longs instead of ~30-byte
      // strings. Grams are per-doc distinct, so a 64-bit collision can
      // only merge two grams' DF counts (P ≈ G²/2⁶⁴ — negligible; the
      // sf0.01 oracle hash confirms no effect at verify scale).
      val grams = Tables.documents(s, dir).select(col("doc_id"),
        explode(array_distinct(graft.functions.TextNgrams.word_ngrams(
          lower(trim(col("text"))), lit(5)))).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      val dfreq = grams.groupBy("gh").agg(count(lit(1)).as("df"))
      grams.join(dfreq, Seq("gh"))
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
    },

    // Sketch-based vocabulary cardinality (differential-tested): a
    // per-language HyperLogLog with m = 4096 registers built from md5
    // hashes — the Flajolet et al. register construction written in
    // engine-portable primitives (the simhash/LSH generated-twin
    // precedent, replacing the opaque engine-internal HLL++): a token's
    // 60-bit md5 prefix splits into a 12-bit register index and a 48-bit
    // remainder whose leading-zero rank the register max-aggregates. At
    // 100 TB an exact distinct shuffles the full token stream; here only
    // (lang, register, max-rank) partials shuffle — a few KB per
    // language. Cross-engine exactness: the harmonic sum is computed as
    // Σ 2^(49-M) in EXACT int64 (max 4096·2^49 = 2^61) with one
    // correctly-rounded int→double conversion at the end, so both
    // engines divide identical doubles; the small-range ln correction
    // follows the q_text_entropy precedent (ln + round agree).
    "q_vocab_sketch" -> QueryDef.sql(
      "vocabulary cardinality: per-lang md5-HLL (m=4096) unique tokens + exact token mass",
      """WITH w AS (
        |  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |h AS (SELECT lang, CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) AS h FROM w),
        |rk AS (
        |  SELECT lang, h // 281474976710656 AS bucket,
        |    CASE WHEN h % 281474976710656 = 0 THEN 49
        |         ELSE 49 - length(bin(h % 281474976710656)) END AS rnk
        |  FROM h),
        |reg AS (SELECT lang, bucket, MAX(rnk) AS m, COUNT(*) AS c
        |        FROM rk GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tokens, COUNT(*) AS ne,
        |    CAST(SUM(CAST(1 AS BIGINT) << (49 - m)) AS BIGINT) AS tp
        |  FROM reg GROUP BY 1),
        |fin AS (
        |  SELECT lang, n_tokens, 4096 - ne AS zeros,
        |    (0.7213 / (1 + 1.079 / 4096.0)) * 16777216.0 * 562949953421312.0 /
        |      CAST((4096 - ne) * 562949953421312 + tp AS DOUBLE) AS raw
        |  FROM agg)
        |SELECT lang, n_tokens,
        |  round(CASE WHEN raw <= 10240.0 AND zeros > 0
        |    THEN 4096.0 * ln(4096.0 / zeros) ELSE raw END, 4) AS approx_vocab_r
        |FROM fin""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
      val hashed = toks.select(col("lang"),
        conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long").as("h"))
      val rest = col("h") % 281474976710656L
      val ranked = hashed.select(col("lang"),
        expr("h div 281474976710656").as("bucket"),
        when(rest === 0, 49).otherwise(lit(49) - length(bin(rest))).as("rnk"))
      val reg = ranked.groupBy("lang", "bucket")
        .agg(max("rnk").as("m"), count(lit(1)).as("c"))
      val agg = reg.groupBy("lang")
        .agg(sum("c").as("n_tokens"), count(lit(1)).as("ne"),
          sum(expr("shiftleft(1L, 49 - m)")).as("tp"))
      val zeros = lit(4096) - col("ne")
      val raw = (lit(0.7213) / (lit(1.0) + lit(1.079) / lit(4096.0))) *
        lit(16777216.0) * lit(562949953421312.0) /
        (zeros.cast("long") * lit(562949953421312L) + col("tp")).cast("double")
      agg.select(col("lang"), col("n_tokens"),
        round(when(raw <= 10240.0 && zeros > 0,
          lit(4096.0) * log(lit(4096.0) / zeros)).otherwise(raw), 4)
          .as("approx_vocab_r"))
    },

    // Per-language vocabulary heavy hitters (differential-tested): the
    // top-10 most frequent tokens per language with counts — the corpus
    // profiling step behind tokenizer training and stopword lists. The
    // term count is a map-side partial aggregate (only (lang, term)
    // partials shuffle, never the token stream); the top-k window runs
    // over the aggregated term table, which is vocab-sized, not
    // corpus-sized. At 100 TB add a per-partition partial top-k before
    // the window so the rank shuffle carries k rows per partition.
    "q_vocab_topk" -> QueryDef.sql(
      "vocabulary heavy hitters: top-10 tokens per language by frequency",
      """WITH w AS (
        |  SELECT lang, unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |wc AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1, 2)
        |SELECT lang, w, c FROM (
        |  SELECT lang, w, c,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rk
        |  FROM wc)
        |WHERE rk <= 10""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, dir)
        .select(col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .groupBy("lang", "w").agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("c").desc, col("w"))))
        .filter(col("rk") <= 10)
        .select("lang", "w", "c")
    },

    // Count-min sketch (differential-tested): estimate term frequencies
    // from 4 × 256 counters instead of a vocab-sized table — the
    // bounded-memory frequency structure for streaming/low-memory corpus
    // profiling. Four md5-keyed hash rows; a term's estimate is the MIN of
    // its four bucket sums, so est ≥ exact always and est ≤ exact + εN
    // w.h.p. (ε = e/256). The query reports estimate vs exact for the
    // global top-20 terms; LlmOpsSpec asserts both bounds. At 100 TB the
    // sketch is a 1 KB array merged map-side (partial aggregation of
    // (row, bucket) keys); the exact term table here exists only as the
    // differential twin.
    "q_vocab_cms" -> QueryDef.sql(
      "count-min sketch: 4x256 counters, top-20 term estimates vs exact",
      """WITH w AS (
        |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1),
        |hb AS (
        |  SELECT h, w, c,
        |    (instr('0123456789abcdef',
        |       substr(md5(CAST(h AS VARCHAR) || '_' || w), 1, 1)) - 1) * 16
        |    + instr('0123456789abcdef',
        |       substr(md5(CAST(h AS VARCHAR) || '_' || w), 2, 1)) - 1 AS b
        |  FROM wc, generate_series(0, 3) t(h)),
        |cms AS (SELECT h, b, CAST(SUM(c) AS BIGINT) AS bc FROM hb GROUP BY 1, 2),
        |top AS (
        |  SELECT w, c FROM (
        |    SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk FROM wc)
        |  WHERE rk <= 20)
        |SELECT top.w, top.c AS c_exact, MIN(cms.bc) AS c_est
        |FROM top JOIN hb ON top.w = hb.w
        |JOIN cms ON hb.h = cms.h AND hb.b = cms.b
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val wc = Tables.documents(s, dir)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val hb = wc.crossJoin(s.range(0, 4).select(col("id").as("h")))
        .withColumn("hash",
          md5(concat(col("h").cast("string"), lit("_"), col("w")).cast("binary")))
        .withColumn("b",
          (expr("instr('0123456789abcdef', substr(hash, 1, 1))") - 1) * 16 +
            expr("instr('0123456789abcdef', substr(hash, 2, 1))") - 1)
        .select("h", "b", "w", "c")
      val cms = hb.groupBy("h", "b").agg(sum("c").cast("long").as("bc"))
      // top-k as orderBy+limit → TakeOrderedAndProject (per-partition
      // partial top-k), never a single-task global window sort of the
      // whole vocabulary
      val top = wc.orderBy(col("c").desc, col("w")).limit(20)
        .select(col("w"), col("c").as("c_exact"))
      top.join(hb.select("w", "h", "b"), Seq("w"))
        .join(cms, Seq("h", "b"))
        .groupBy("w", "c_exact")
        .agg(min("bc").as("c_est"))
    },

    // DSIR-style importance selection (differential-tested): Data
    // Selection via Importance Resampling (Xie et al. 2023) — score every
    // doc by how much more likely its hashed-unigram features are under a
    // TARGET distribution (here: the English subset as the quality-domain
    // proxy) than under the RAW corpus distribution, then keep the top
    // slice. Features are md5-hashed into 256 buckets; both bucket
    // distributions are Laplace-smoothed; a doc's score is its mean
    // per-token log importance weight, accumulated exactly per (doc,
    // bucket) so ranking is engine-independent. At 100 TB: both bucket
    // tables are 256-row aggregates that BROADCAST, so scoring is one
    // corpus scan + a doc-keyed partial aggregate — no term-keyed shuffle
    // at all (the hashing bounds the feature domain; that is the point of
    // DSIR over exact-LM scoring).
    "q_select_dsir" -> QueryDef.sql(
      "DSIR importance selection: hashed-unigram target/raw log-ratio, top-50 docs",
      """WITH w AS (
        |  SELECT doc_id, lang,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |tb AS (
        |  SELECT doc_id, lang,
        |    (instr('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |    + instr('0123456789abcdef', substr(md5(w), 2, 1)) - 1 AS b
        |  FROM w),
        |tstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM tb WHERE lang = 'en'),
        |rstat AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM tb),
        |tcnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct FROM tb
        |         WHERE lang = 'en' GROUP BY b),
        |rcnt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM tb GROUP BY b),
        |lw AS (
        |  SELECT r.b,
        |    ln((COALESCE(t.ct, 0) + 1.0) / (nt + 256.0))
        |      - ln((r.cr + 1.0) / (nr + 256.0)) AS lw
        |  FROM rcnt r LEFT JOIN tcnt t ON r.b = t.b
        |  CROSS JOIN tstat CROSS JOIN rstat),
        |db AS (SELECT doc_id, b, COUNT(*) AS n FROM tb GROUP BY 1, 2),
        |sc AS (
        |  SELECT db.doc_id, CAST(SUM(db.n) AS BIGINT) AS n_tokens,
        |    SUM(CAST(db.n * lw.lw AS DECIMAL(28,12))) AS logw
        |  FROM db JOIN lw ON db.b = lw.b GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(CAST(logw AS DOUBLE) / n_tokens, 6) AS mean_logw_r
        |FROM sc
        |ORDER BY CAST(logw AS DOUBLE) / n_tokens DESC, doc_id
        |LIMIT 50""".stripMargin) { (s, dir) =>
      val tb = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .withColumn("hash", md5(col("w").cast("binary")))
        .withColumn("b",
          (expr("instr('0123456789abcdef', substr(hash, 1, 1))") - 1) * 16 +
            expr("instr('0123456789abcdef', substr(hash, 2, 1))") - 1)
        .select("doc_id", "lang", "b")
      val tcnt = tb.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val rcnt = tb.groupBy("b").agg(count(lit(1)).as("cr"))
      val tstat = tb.filter(col("lang") === "en")
        .agg(count(lit(1)).as("nt"))
      val rstat = tb.agg(count(lit(1)).as("nr"))
      val lw = rcnt.join(tcnt, Seq("b"), "left")
        .crossJoin(broadcast(tstat)).crossJoin(broadcast(rstat))
        .select(col("b"),
          (log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("nt") + 256.0)) -
            log((col("cr") + 1.0) / (col("nr") + 256.0))).as("lw"))
      val db = tb.groupBy("doc_id", "b").agg(count(lit(1)).as("n"))
      db.join(broadcast(lw), Seq("b"))
        .groupBy("doc_id")
        .agg(sum("n").cast("long").as("n_tokens"),
          sum((col("n") * col("lw")).cast(DecimalType(28, 12))).as("logw"))
        .withColumn("mw", col("logw").cast("double") / col("n_tokens"))
        .orderBy(col("mw").desc, col("doc_id"))
        .select(col("doc_id"), col("n_tokens"), round(col("mw"), 6).as("mean_logw_r"))
        .limit(50)
    },

    // The full filter funnel with per-stage attrition (differential-
    // tested): the RefinedWeb-style report every production pipeline
    // prints — how many docs each gate removes, applied in sequence:
    // length → stopword evidence → exact dedup (earliest keeper) →
    // eval-set decontamination. The flag stages are computed in ONE scan
    // (conditional aggregation); dedup adds its digest-keyed shuffle and
    // decon its broadcast anti-join — exactly the costs the stages
    // themselves have, so the report is free relative to running the
    // pipeline. Stage ids keep the funnel ordered without string sorts.
    "q_filter_funnel" -> QueryDef.sql(
      "filter funnel: per-stage surviving-doc counts (length -> stopwords -> dedup -> decon)",
      s"""WITH s1 AS (SELECT * FROM documents WHERE length(text) >= 50),
         |s2 AS (SELECT * FROM s1
         |       WHERE len(regexp_extract_all(text, '$StopRe')) >= 1),
         |s3 AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM s2
         |       GROUP BY md5(text)),
         |s4 AS (
         |  SELECT doc_id FROM s3
         |  WHERE doc_id % 97 <> 0
         |    AND h NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 97 = 0))
         |SELECT 0 AS stage, 'all' AS gate, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM documents
         |UNION ALL SELECT 1, 'min_length', CAST(COUNT(*) AS BIGINT) FROM s1
         |UNION ALL SELECT 2, 'stopword_evidence', CAST(COUNT(*) AS BIGINT) FROM s2
         |UNION ALL SELECT 3, 'exact_dedup', CAST(COUNT(*) AS BIGINT) FROM s3
         |UNION ALL SELECT 4, 'decontaminate', CAST(COUNT(*) AS BIGINT) FROM s4""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val f1 = gateMinLength
      val f2 = gateStopword
      // stages 0-2 are flag predicates: ONE corpus scan, one conditional
      // aggregate (no per-stage re-scan)
      val flagCounts = docs.select(f1.cast("long").as("p1"), f2.cast("long").as("p2"))
        .agg(count(lit(1)).as("n0"), sum("p1").as("n1"), sum("p2").as("n2"))
      val head = flagCounts.select(explode(array(
        struct(lit(0).as("stage"), lit("all").as("gate"), col("n0").as("n_docs")),
        struct(lit(1).as("stage"), lit("min_length").as("gate"), col("n1").as("n_docs")),
        struct(lit(2).as("stage"), lit("stopword_evidence").as("gate"), col("n2").as("n_docs"))))
        .as("r")).select("r.*")
      // stages 3-4 share one digest-keyed pass: keepers per md5, then a
      // broadcast eval-fingerprint mark — both counts from one aggregate
      val evalFps = docs.filter(col("doc_id") % 97 === 0)
        .select(md5(col("text")).as("h")).distinct()
        .withColumn("in_eval", lit(1))
      val tailCounts = docs.filter(f2)
        .groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("doc_id"))
        .join(broadcast(evalFps), Seq("h"), "left")
        .agg(count(lit(1)).as("n3"),
          sum((col("doc_id") % 97 =!= 0 && col("in_eval").isNull)
            .cast("long")).as("n4"))
      val tail = tailCounts.select(explode(array(
        struct(lit(3).as("stage"), lit("exact_dedup").as("gate"), col("n3").as("n_docs")),
        struct(lit(4).as("stage"), lit("decontaminate").as("gate"), col("n4").as("n_docs"))))
        .as("r")).select("r.*")
      head.unionAll(tail)
    },

    // The corpus CLI composed END-TO-END (jobs/CorpusBuild.run): gate →
    // PII redaction → digest dedup → eval decontamination → shard
    // assignment, emitting the attrition funnel UNION the per-shard
    // balance table the CLI prints — against one full SQL re-derivation.
    // Differs from q_filter_funnel above in exactly the ways the CLI
    // does: digests are over the REDACTED text, the eval side redacts
    // before fingerprinting, and the kept set carries shard ids from the
    // doc_id md5 nibble. Funnel rows use stages 0-4 / n_tokens 0; shard
    // rows use stages 100+shard with real token mass.
    "q_corpus_build" -> QueryDef.sql(
      "corpus CLI end-to-end: attrition funnel + shard balance vs SQL re-derivation",
      s"""WITH red AS (
         |  SELECT doc_id, regexp_replace(text, '$PiiRe', '<PII>', 'g') AS rtext,
         |         text AS orig
         |  FROM documents),
         |ev AS (
         |  SELECT DISTINCT md5(rtext) AS h FROM red WHERE doc_id % 97 = 0),
         |g AS (
         |  SELECT doc_id, rtext, md5(rtext) AS h FROM red
         |  WHERE length(orig) >= 50
         |    AND len(regexp_extract_all(orig, '$StopRe')) >= 1),
         |k AS (SELECT h, MIN(doc_id) AS doc_id FROM g GROUP BY h),
         |kept AS (
         |  SELECT g.doc_id, g.rtext,
         |    instr('0123456789abcdef', substr(md5(CAST(g.doc_id AS VARCHAR)), 1, 1)) - 1
         |      AS shard
         |  FROM g JOIN k ON g.h = k.h AND g.doc_id = k.doc_id
         |  WHERE g.h NOT IN (SELECT h FROM ev)),
         |funnel AS (
         |      SELECT 0 AS stage, 'all' AS gate,
         |             CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
         |             CAST(0 AS BIGINT) AS n_tokens
         |  UNION ALL SELECT 1, 'min_length',
         |             CAST((SELECT COUNT(*) FROM documents WHERE length(text) >= 50) AS BIGINT), 0
         |  UNION ALL SELECT 2, 'stopword_evidence', CAST((SELECT COUNT(*) FROM g) AS BIGINT), 0
         |  UNION ALL SELECT 3, 'exact_dedup', CAST((SELECT COUNT(*) FROM k) AS BIGINT), 0
         |  UNION ALL SELECT 4, 'decontaminate', CAST((SELECT COUNT(*) FROM kept) AS BIGINT), 0),
         |sh AS (
         |  SELECT 100 + shard AS stage, 'shard_' || CAST(shard AS VARCHAR) AS gate,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(len(string_split_regex(trim(rtext), '\\s+'))) AS BIGINT) AS n_tokens
         |  FROM kept GROUP BY shard)
         |SELECT * FROM funnel UNION ALL SELECT * FROM sh""".stripMargin) { (s, dir) =>
      val r = corpusBuildResult(s, dir)
      r.funnel.withColumn("n_tokens", lit(0L)).unionAll(
        r.shards.select((col("shard") + 100).as("stage"),
          concat(lit("shard_"), col("shard").cast("string")).as("gate"),
          col("n_docs"), col("n_tokens")))
    },

    // Data-mixing weights (differential-tested): per-language sampling
    // rates that move the corpus toward an equal-share language mix —
    // the planning step ahead of q_sample_stratified's quota draw.
    // Over-represented strata get rate = target/n, under-represented cap
    // at 1.0 (single-pass variant; iterative reallocation of the shortfall
    // is a driver-side loop over this same tiny aggregate). Two tiny
    // aggregates; the corpus itself is never reshuffled.
    "q_mix_weights" -> QueryDef.sql(
      "data-mixing weights: per-language sampling rate toward equal shares",
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_langs FROM c)
        |SELECT lang, n AS n_docs,
        |  round(LEAST(1.0, (total * 1.0 / n_langs) / n), 6) AS sample_rate,
        |  CAST(FLOOR(n * LEAST(1.0, (total * 1.0 / n_langs) / n)) AS BIGINT)
        |    AS expected_kept
        |FROM c CROSS JOIN t""".stripMargin) { (s, dir) =>
      val c = Tables.documents(s, dir).groupBy("lang").agg(count(lit(1)).as("n"))
      val t = c.agg(sum("n").cast("long").as("total"), count(lit(1)).as("n_langs"))
      val rate = least(lit(1.0), (col("total") * 1.0 / col("n_langs")) / col("n"))
      c.crossJoin(broadcast(t))
        .select(col("lang"), col("n").as("n_docs"),
          round(rate, 6).as("sample_rate"),
          floor(col("n") * rate).cast("long").as("expected_kept"))
    },

    // Corpus data-card rollup (differential-tested): the per-(language,
    // source) release statistics every corpus ships — doc/char/token mass
    // and token-length quantiles. One scan, one small group-by; the exact
    // percentile is per-group so skewed strata can be salted at 100 TB
    // (or swapped for approx_percentile when exactness isn't contractual).
    "q_corpus_stats" -> QueryDef.sql(
      "corpus data card: per (lang, source) doc/char/token mass + length quantiles",
      """WITH t AS (
        |  SELECT lang, source, n_chars,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents)
        |SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        |  round(quantile_cont(n_tok, 0.5), 6) AS p50_tokens,
        |  round(quantile_cont(n_tok, 0.9), 6) AS p90_tokens
        |FROM t GROUP BY lang, source""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), col("source"), col("n_chars"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("long").as("total_chars"),
          sum("n_tok").cast("long").as("total_tokens"),
          round(expr("percentile(n_tok, 0.5)"), 6).as("p50_tokens"),
          round(expr("percentile(n_tok, 0.9)"), 6).as("p90_tokens"))
    },

    // N-gram-overlap decontamination (differential-tested): the stronger
    // form of test-set-overlap removal — drop a training doc if it shares
    // ANY word-13-gram with the held-out eval set (the exact-fingerprint
    // variant above only catches verbatim copies). Eval-side grams are
    // tiny next to the corpus, so they BROADCAST; the training side
    // explodes its grams scan-locally, marks contaminated doc_ids, and
    // anti-joins — the document text itself never shuffles.
    "q_decontaminate_ngram" -> QueryDef.sql(
      "n-gram decontamination: drop training docs sharing a 13-gram with the eval set",
      """WITH d AS (SELECT doc_id, lang, n_chars,
        |             string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |eg AS (SELECT DISTINCT array_to_string(ws[i:i+12], ' ') AS g
        |       FROM (SELECT ws, unnest(generate_series(1, len(ws) - 12)) AS i
        |             FROM d WHERE doc_id % 97 = 0)),
        |tg AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+12], ' ') AS g
        |       FROM (SELECT doc_id, ws,
        |             unnest(generate_series(1, len(ws) - 12)) AS i
        |             FROM d WHERE doc_id % 97 <> 0)),
        |bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN eg ON tg.g = eg.g)
        |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM d
        |WHERE doc_id % 97 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
        |GROUP BY lang""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      def grams(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        explode(array_distinct(graft.functions.TextNgrams.word_ngrams(
          lower(trim(col("text"))), lit(13)))).as("g"))
      val evalGrams = grams(docs.filter(col("doc_id") % 97 === 0))
        .select("g").distinct()
      val contaminated = grams(docs.filter(col("doc_id") % 97 =!= 0))
        .join(broadcast(evalGrams), Seq("g"))
        .select("doc_id").distinct()
      docs.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(contaminated), Seq("doc_id"), "left_anti")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum("n_chars").cast("long").as("total_chars"))
    },

    // Bloom-filter decontamination: the scale path for when the eval-set
    // fingerprint list outgrows an exact broadcast (hundreds of benchmarks
    // × millions of grams). The eval fingerprints compress into a ~1 %
    // false-positive Bloom filter — kilobytes instead of the exact set —
    // broadcast to every task; membership is a scan-local probe with NO
    // join at all on the training side. Bloom semantics: no false
    // negatives, so every truly-contaminated doc is still dropped; the FP
    // rate costs a bounded sliver of clean docs (LlmOpsSpec pins both
    // properties against the exact q_decontaminate).
    //
    // Differential-tested (the CMS precedent): the filter is built from
    // PORTABLE primitives — k = 7 bit positions per fingerprint via
    // Kirsch–Mitzenmacher double hashing, b_j = (h1 + j·h2) mod m with
    // h1/h2 the first/second 32-bit md5 slices, and m = the next power of
    // two ≥ 10·n capped at 2²⁶ (k=7, m/n≈10 → FP ≈ 0.8 %) — so the DuckDB
    // twin reconstructs the identical bit set and replays the probe as a
    // positional hit-count. 32-bit hash material keeps positions uniform
    // for any m up to the cap (a 16-bit slice would saturate past 2¹⁶),
    // and the cap is mirrored in the oracle's LEAST(…, 26).
    // (True log2(10n) is never an integer — 2^k has no factor 5 — so the
    // oracle's CEIL(LOG2) and the engine's next-pow-2 loop always agree.)
    "q_decontaminate_bloom" -> QueryDef.sql(
      "decontamination via broadcast md5-Bloom (k=7 double-hashed, m=min(2^ceil(log2(10n)),2^26)): no false negatives, ~1% over-drop",
      """WITH ev AS (SELECT md5(text) AS h FROM documents WHERE doc_id % 97 = 0),
        |mm AS (SELECT CAST(power(2, LEAST(CEIL(LOG2(10 * GREATEST(COUNT(*), 1))), 26))
        |              AS BIGINT) AS m
        |       FROM ev),
        |bits AS (
        |  SELECT DISTINCT (CAST('0x' || substr(h, 1, 8) AS BIGINT)
        |                   + j * CAST('0x' || substr(h, 9, 8) AS BIGINT)) % m AS b
        |  FROM (SELECT h, unnest(generate_series(0, 6)) AS j FROM ev), mm),
        |tr AS (SELECT doc_id, lang, n_chars, md5(text) AS h
        |       FROM documents WHERE doc_id % 97 <> 0),
        |trpos AS (
        |  SELECT doc_id, (CAST('0x' || substr(h, 1, 8) AS BIGINT)
        |                  + j * CAST('0x' || substr(h, 9, 8) AS BIGINT)) % m AS b
        |  FROM (SELECT doc_id, h, unnest(generate_series(0, 6)) AS j FROM tr), mm),
        |hits AS (SELECT doc_id, COUNT(*) AS k FROM trpos JOIN bits USING (b) GROUP BY 1)
        |SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM tr LEFT JOIN hits USING (doc_id)
        |WHERE COALESCE(hits.k, 0) < 7
        |GROUP BY lang""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val eval = docs.filter(col("doc_id") % 97 === 0)
      val n = math.max(eval.count(), 1L)
      var m = 1
      while (m < 10 * n && m < (1 << 26)) m *= 2 // bits; packed, 2^26 caps the broadcast at 8 MiB
      def positions(h: org.apache.spark.sql.Column) = {
        val h1 = conv(substring(h, 1, 8), 16, 10).cast("long")
        val h2 = conv(substring(h, 9, 8), 16, 10).cast("long")
        (0 until 7).map(j => ((h1 + lit(j.toLong) * h2) % m).cast("int"))
      }
      // the eval bit set: ≤ 7·n distinct positions of an m-bit filter —
      // kilobytes, the artifact that broadcasts at any corpus size
      val bits = eval
        .select(explode(array(positions(md5(col("text"))): _*)).as("b"))
        .distinct().collect().map(_.getInt(0))
      val bitset = new Array[Long]((m + 63) >>> 6) // packed: m/8 bytes, 8 MiB at the 2^26 cap
      bits.foreach(p => bitset(p >>> 6) |= 1L << (p & 63))
      val bsB = s.sparkContext.broadcast(bitset)
      val probe = udf((ps: Seq[Int]) =>
        ps.forall(p => (bsB.value(p >>> 6) & (1L << (p & 63))) != 0L))
      docs.filter(col("doc_id") % 97 =!= 0)
        .filter(!probe(array(positions(md5(col("text"))): _*)))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"),
          sum("n_chars").cast("long").as("total_chars"))
    },

    // Bigram-LM quality scoring (differential-tested): the CCNet-style
    // perplexity gate — train bigram/unigram counts on the corpus itself,
    // score each doc by its mean bigram negative log-likelihood
    // nll = mean(ln C(w1) − ln C(w1,w2)). Per-bigram terms are truncated
    // to DECIMAL(28,12) before summing, so scores are order-independent
    // and bit-equal across engines. At 100 TB both count tables and the
    // scoring join are term-keyed shuffles (unbounded vocab — no
    // broadcast), and the per-doc mean is a doc-keyed partial aggregate.
    "q_text_lm_score" -> QueryDef.sql(
      "bigram-LM quality score: corpus-trained counts, per-doc mean NLL",
      """WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |bg AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |       FROM (SELECT doc_id, ws,
        |             unnest(generate_series(1, len(ws) - 1)) AS i FROM d)),
        |uc AS (SELECT w1, COUNT(*) AS cu FROM bg GROUP BY w1),
        |bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY w1, w2),
        |scored AS (
        |  SELECT bg.doc_id, COUNT(*) AS n_bigrams,
        |    SUM(CAST(ln(CAST(uc.cu AS DOUBLE)) - ln(CAST(bc.cb AS DOUBLE))
        |        AS DECIMAL(28,12))) AS nll
        |  FROM bg JOIN uc ON bg.w1 = uc.w1
        |  JOIN bc ON bg.w1 = bc.w1 AND bg.w2 = bc.w2
        |  GROUP BY bg.doc_id)
        |SELECT doc_id, n_bigrams,
        |  round(CAST(nll AS DOUBLE) / n_bigrams, 6) AS mean_nll_r
        |FROM scored""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val bg = Tables.documents(s, dir).select(col("doc_id"),
        explode(graft.functions.TextNgrams.word_ngrams(
          lower(trim(col("text"))), lit(2))).as("b"))
        .select(col("doc_id"),
          substring_index(col("b"), " ", 1).as("w1"),
          substring_index(col("b"), " ", -1).as("w2"))
      val uc = bg.groupBy("w1").agg(count(lit(1)).as("cu"))
      val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      bg.join(uc, Seq("w1")).join(bc, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum((log(col("cu").cast("double")) - log(col("cb").cast("double")))
            .cast(DecimalType(28, 12))).as("nll"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("nll").cast("double") / col("n_bigrams"), 6).as("mean_nll_r"))
    },

    // Collocation mining via pointwise mutual information (differential-
    // tested): PMI = ln(c(w1,w2)·N / (c1(w1)·c2(w2))) over corpus bigrams
    // with a min-count support floor — the phrase-mining signal behind
    // tokenizer merge candidates and stopword-phrase lists. Positional
    // unigram counts (w1-slot, w2-slot) keep the estimator self-consistent
    // and the math one ln per pair — no summation, so doubles are safely
    // engine-identical. Shuffle shape: term-keyed count aggregates (the
    // same tables the bigram LM trains), a broadcast of the two 1-row
    // totals, and a top-k over the support-filtered pair table.
    "q_text_pmi" -> QueryDef.sql(
      "collocations: top-20 bigrams by PMI with support >= 5",
      """WITH d AS (SELECT string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |bg AS (SELECT ws[i] AS w1, ws[i+1] AS w2
        |       FROM (SELECT ws,
        |             unnest(generate_series(1, len(ws) - 1)) AS i FROM d)),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM bg),
        |uc1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY w1),
        |uc2 AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY w2),
        |bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cb FROM bg
        |       GROUP BY w1, w2 HAVING COUNT(*) >= 5)
        |SELECT w1, w2, cb,
        |  round(ln(CAST(cb AS DOUBLE) * n / (CAST(c1 AS DOUBLE) * c2)), 6) AS pmi_r
        |FROM bc JOIN uc1 USING (w1) JOIN uc2 USING (w2) CROSS JOIN n
        |ORDER BY ln(CAST(cb AS DOUBLE) * n / (CAST(c1 AS DOUBLE) * c2)) DESC, w1, w2
        |LIMIT 20""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val bg = Tables.documents(s, dir).select(
        explode(graft.functions.TextNgrams.word_ngrams(
          lower(trim(col("text"))), lit(2))).as("b"))
        .select(substring_index(col("b"), " ", 1).as("w1"),
          substring_index(col("b"), " ", -1).as("w2"))
      val n = bg.agg(count(lit(1)).as("n"))
      val uc1 = bg.groupBy("w1").agg(count(lit(1)).as("c1"))
      val uc2 = bg.groupBy("w2").agg(count(lit(1)).as("c2"))
      val bc = bg.groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
        .filter(col("cb") >= 5)
      val pmi = log(col("cb").cast("double") * col("n") /
        (col("c1").cast("double") * col("c2")))
      bc.join(uc1, Seq("w1")).join(uc2, Seq("w2")).crossJoin(broadcast(n))
        .orderBy(pmi.desc, col("w1"), col("w2"))
        .select(col("w1"), col("w2"), col("cb"), round(pmi, 6).as("pmi_r"))
        .limit(20)
    },

    // BM25 retrieval (differential-tested): the inverted-index scoring a
    // retrieval/labeling pipeline runs over a corpus. Posting lists are
    // (term, doc, tf) rows; document stats (dl, avgdl, N) come from one
    // pass; queries are a broadcast VALUES block, so adding queries never
    // adds corpus passes. Per-term contributions accumulate as exact
    // decimals (the double product is truncated to DECIMAL(28,12) before
    // the sum), so the score — and therefore the top-k ranking — is
    // order-of-summation independent and bit-equal across engines.
    // At 100 TB: tf/df are term-keyed shuffles (unbounded domain — no
    // broadcast), the scored join is term-keyed too, and the final top-k
    // is a per-query window over candidates only.
    "q_text_bm25" -> QueryDef.sql(
      "BM25 retrieval: inverted index + idf scoring, 3 queries, top-5 docs each",
      """WITH q(qid, term) AS (VALUES
        |  (0,'spark'),(0,'join'),(0,'hash'),
        |  (1,'scan'),(1,'filter'),(1,'merge'),
        |  (2,'window'),(2,'agg'),(2,'stream')),
        |w AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, COUNT(*) AS dl FROM w GROUP BY doc_id),
        |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT q.qid, tf.doc_id,
        |    SUM(CAST(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |        tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl))
        |        AS DECIMAL(28,12))) AS score
        |  FROM q JOIN tf ON q.term = tf.term
        |  JOIN df ON q.term = df.term
        |  JOIN dl ON tf.doc_id = dl.doc_id
        |  CROSS JOIN stats
        |  GROUP BY q.qid, tf.doc_id)
        |SELECT qid, doc_id, score_r FROM (
        |  SELECT qid, doc_id, round(CAST(score AS DOUBLE), 6) AS score_r,
        |    ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rk
        |  FROM scored)
        |WHERE rk <= 5""".stripMargin) { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val q = Seq(
        (0, "spark"), (0, "join"), (0, "hash"),
        (1, "scan"), (1, "filter"), (1, "merge"),
        (2, "window"), (2, "agg"), (2, "stream")).toDF("qid", "term")
      val w = Tables.documents(s, dir).select(col("doc_id"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("term"))
      val tf = w.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dl = w.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
      // df over the full vocabulary: term-keyed shuffle at scale (the
      // domain is unbounded — only the QUERY block broadcasts)
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val contrib = (log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
        col("tf") * lit(2.2) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .cast(DecimalType(28, 12))
      tf.join(broadcast(q), Seq("term"))
        .join(dfreq, Seq("term"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy("qid", "doc_id")
        .agg(sum(contrib).as("score"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("qid").orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rk") <= 5)
        .select(col("qid"), col("doc_id"),
          round(col("score").cast("double"), 6).as("score_r"))
    },

    // Sequence packing (differential-tested): the concat-then-chunk
    // packing a pretraining run applies — documents are concatenated in a
    // deterministic order per language stream and cut into fixed-capacity
    // token bins; each doc's bin is the one containing its first token.
    // The prefix sum is one window per stream; at 100 TB the stream is
    // range-partitioned and the per-partition sums combine with one tiny
    // offsets broadcast (two passes, no global sort).
    "q_pack_sequences" -> QueryDef.sql(
      "sequence packing: concat-then-chunk token bins per language (capacity 2048)",
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, lang, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT lang, CAST((cum - n_tok) // 2048 AS BIGINT) AS bin,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.documents(s, dir).select(col("doc_id"), col("lang"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tok"))
      val cum = t.withColumn("cum", sum("n_tok").over(
        Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.groupBy(col("lang"),
          floor((col("cum") - col("n_tok")) / 2048).as("bin"))
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").cast("long").as("bin_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    },

    // PII scrubbing (differential-tested): redact account-id / email /
    // phone shapes and report the per-segment audit trail (match counts,
    // before/after char mass). Scan-local + one small group-by — linear at
    // 100 TB. The pattern set is [[PiiRe]]; the planted-PII spec proves
    // the email/phone branches on synthetic rows (the test corpus only
    // carries id-shaped digit runs).
    "q_pii_redact" -> QueryDef.sql(
      "PII scrubbing: redact ids/emails/phones, per-segment audit counts",
      s"""SELECT c_mktsegment, COUNT(*) AS n_rows,
         |  CAST(SUM(len(regexp_extract_all(c_name, '$PiiRe'))) AS BIGINT) AS n_pii,
         |  CAST(SUM(length(c_name)) AS BIGINT) AS chars_before,
         |  CAST(SUM(length(regexp_replace(c_name, '$PiiRe', '<PII>', 'g'))) AS BIGINT)
         |    AS chars_after
         |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum(size(regexp_extract_all(col("c_name"), lit(PiiRe), lit(0))))
            .cast("long").as("n_pii"),
          sum(length(col("c_name"))).cast("long").as("chars_before"),
          sum(length(redactPii(col("c_name")))).cast("long").as("chars_after"))
    },

    // Line-level boilerplate removal (differential-tested): the
    // within-document counterpart of q_dedup_apply — RefinedWeb/CCNet drop
    // repeated LINES (headers, nav bars, license banners) from every
    // document rather than dropping whole documents. This corpus has no
    // newlines, so a "line" is a fixed 5-word segment; any segment that
    // appears in ≥2 distinct documents is removed everywhere and the
    // document is re-assembled from the surviving segments in order. At
    // 100 TB: segments shuffle once on their content (the dup set is
    // boilerplate — small — and AQE broadcasts the join), re-assembly is
    // one doc-keyed aggregate, and the text column never shuffles twice.
    "q_text_line_dedup" -> QueryDef.sql(
      "boilerplate span removal: drop 5-word segments shared by >=2 docs, reassemble",
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS ws FROM documents),
        |ch AS (
        |  SELECT doc_id, i AS idx,
        |    array_to_string(ws[(i*5+1):(i*5+5)], ' ') AS chunk
        |  FROM (SELECT doc_id, ws,
        |        unnest(generate_series(0, (len(ws) - 1) // 5)) AS i FROM d)),
        |dup AS (
        |  SELECT chunk, 1 AS dd FROM ch GROUP BY chunk
        |  HAVING COUNT(DISTINCT doc_id) >= 2),
        |k AS (
        |  SELECT ch.doc_id, ch.idx, ch.chunk, dup.dd IS NOT NULL AS is_dup
        |  FROM ch LEFT JOIN dup ON ch.chunk = dup.chunk),
        |p AS (
        |  SELECT doc_id, COUNT(*) AS n_chunks,
        |    CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |    COALESCE(string_agg(chunk, ' ' ORDER BY idx)
        |      FILTER (WHERE NOT is_dup), '') AS clean
        |  FROM k GROUP BY doc_id)
        |SELECT doc_id, n_chunks, n_dropped,
        |  CAST(length(clean) AS BIGINT) AS clean_len, md5(clean) AS clean_md5
        |FROM p""".stripMargin) { (s, dir) =>
      val ch = Tables.documents(s, dir)
        .select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
        .select(col("doc_id"), posexplode(expr(
          "transform(sequence(0, cast((size(ws)+4)/5 as int) - 1)," +
            " k -> concat_ws(' ', slice(ws, k*5+1, 5)))")))
        .select(col("doc_id"), col("pos").as("idx"), col("col").as("chunk"))
      val dup = ch.groupBy("chunk")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2)
        .select(col("chunk"), lit(1).as("dd"))
      ch.join(dup, Seq("chunk"), "left")
        .withColumn("is_dup", col("dd").isNotNull)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dropped"),
          concat_ws(" ", transform(
            array_sort(collect_list(when(!col("is_dup"),
              struct(col("idx"), col("chunk"))))),
            x => x.getField("chunk"))).as("clean"))
        .select(col("doc_id"), col("n_chunks"), col("n_dropped"),
          length(col("clean")).cast("long").as("clean_len"),
          md5(col("clean").cast("binary")).as("clean_md5"))
    },

    // Exact-substring SPAN removal (differential-tested): the apply side
    // of Lee et al. 2022's exact-substring dedup at word granularity —
    // where q_text_line_dedup drops fixed non-overlapping segments, this
    // cuts EVERY word position covered by any cross-doc duplicate
    // 5-gram (overlapping grams merge into maximal spans by position
    // union) and reassembles the survivors in order. Shuffle shape at
    // 100 TB: one gram-content shuffle for the document frequencies
    // (swap the gram string for a 64-bit xxhash key like
    // q_text_dup_ngrams), a narrow position explode for coverage, and
    // one doc-keyed aggregate to rebuild — the text itself never joins.
    "q_text_span_dedup" -> QueryDef.sql(
      "exact-substring span removal: cut positions covered by cross-doc dup 5-grams, reassemble",
      """WITH d AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
        |           FROM documents),
        |gr AS (SELECT doc_id, i, array_to_string(ws[i:i+4], ' ') AS g
        |       FROM (SELECT doc_id, ws,
        |             unnest(generate_series(1, len(ws) - 4)) AS i FROM d)),
        |dup AS (SELECT g FROM gr GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
        |cov AS (SELECT DISTINCT gr.doc_id, gr.i + o AS p
        |        FROM gr JOIN dup ON gr.g = dup.g, generate_series(0, 4) s(o)),
        |w AS (SELECT doc_id, i AS p, ws[i] AS w
        |      FROM (SELECT doc_id, ws,
        |            unnest(generate_series(1, len(ws))) AS i FROM d)),
        |kept AS (SELECT w.doc_id, w.p, w.w FROM w LEFT JOIN cov
        |         ON w.doc_id = cov.doc_id AND w.p = cov.p WHERE cov.p IS NULL),
        |reb AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |          string_agg(w, ' ' ORDER BY p) AS clean
        |        FROM kept GROUP BY doc_id)
        |SELECT d.doc_id, CAST(len(ws) AS BIGINT) AS n_words,
        |  COALESCE(n_kept, 0) AS n_kept,
        |  md5(COALESCE(clean, '')) AS clean_md5
        |FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id""".stripMargin) { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val grams = docs.select(col("doc_id"), posexplode(
        graft.functions.TextNgrams.word_ngrams(lower(trim(col("text"))), lit(5))))
        .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("g"))
      val dup = grams.groupBy("g")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2).select("g")
      val covered = grams.join(dup, Seq("g"))
        .select(col("doc_id"), explode(sequence(col("i"), col("i") + 4)).as("p"))
        .distinct()
      val words = docs.select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")))
        .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("w"))
      val reb = words.join(covered, Seq("doc_id", "p"), "left_anti")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          concat_ws(" ", transform(
            array_sort(collect_list(struct(col("p"), col("w")))),
            x => x.getField("w"))).as("clean"))
      docs.select(col("doc_id"),
        size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n_words"))
        .join(reb, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_words"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          md5(coalesce(col("clean"), lit("")).cast("binary")).as("clean_md5"))
    },

    // Deterministic output sharding (differential-tested): the writer-side
    // primitive of a training pipeline — every document is assigned a
    // shard by a hash of its id (first md5 nibble → 16 shards here), and
    // the per-shard doc/token masses prove the assignment balances. At
    // 100 TB the shard id is the repartition/partitionBy key for the
    // final corpus write; shard count scales as corpus_bytes /
    // target_shard_bytes by widening the nibble to more hex digits, and
    // balance holds because md5 is uniform in the id, not the content.
    "q_corpus_shard" -> QueryDef.sql(
      "training-shard assignment: md5-nibble shard id + per-shard balance stats",
      """SELECT shard, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM (
        |  SELECT *, instr('0123456789abcdef',
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS shard
        |  FROM documents)
        |GROUP BY shard""".stripMargin) { (s, dir) =>
      Tables.documents(s, dir)
        .withColumn("shard",
          expr("instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 1, 1)) - 1"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), " "))).cast("long").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    }
  )
}
