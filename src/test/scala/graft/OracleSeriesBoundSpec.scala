package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r17 item 3: the DuckDB oracles used to bound their
  * position-series with fixed literals (`generate_series(1, 600)` word
  * positions, `(1, 1200)` char positions, `(0, 120)` segment indexes)
  * sized to the fixture-corpus conventions — a silent-truncation class:
  * the driver regenerates /root/testdata with longer fixtures and the
  * oracle quietly drops tail n-grams (dc7c541 bumped two such caps after
  * the fact). r18 removed the class structurally: every fixture-scaling
  * series now derives its bound from the data itself via
  * `unnest(generate_series(1, len(...) - k))` (DuckDB 1.0 rejects both
  * lateral and scalar-subquery arguments to the TABLE-function form, so
  * the list-function + unnest idiom is the portable spelling). This spec
  * pins the convention: a fixed series literal large enough to be a
  * fixture cap (≥ 100) must never reappear in any oracle. Small
  * structural constants — embedding dim 64, hash-family sizes 3/6, the
  * 5-gram span width 4 — are schema/algorithm constants whose mismatch
  * fails loud at the gate, and stay allowed. */
class OracleSeriesBoundSpec extends AnyFunSuite {

  test("no oracle bounds a fixture-scaling series with a fixed literal") {
    val series = raw"generate_series\(\s*-?\d+\s*,\s*(\d+)\s*\)".r
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        series.findAllMatchIn(sql)
          .map(_.group(1).toInt)
          .filter(_ >= 100)
          .map(bound => s"$name: generate_series literal bound $bound")
    }
    assert(offenders.isEmpty,
      "fixture-scaling series must derive their bound from the data " +
        "(unnest(generate_series(1, len(...) - k))), not a fixed " +
        s"literal:\n${offenders.mkString("\n")}")
  }

  test("the derived-bound idiom is present where the caps used to be") {
    // anti-vacuity: the queries that carried the 600/1200/120 caps must
    // now carry the derived form — if someone deletes the oracle chain
    // entirely the literal scan above would pass trivially.
    val derived = raw"unnest\(generate_series\(".r
    for (q <- Seq("q_text_repetition", "q_text_dup_ngrams",
        "q_decontaminate_ngram", "q_text_lm_score", "q_text_pmi",
        "q_text_line_dedup", "q_text_span_dedup", "q_dedup_minhash",
        "q_dedup_ngram_jaccard", "q_dedup_winnow")) {
      val sql = SparkEntry.oracleSql(q)
      assert(derived.findFirstIn(sql).isDefined,
        s"$q lost its data-derived series bound")
    }
  }
}
