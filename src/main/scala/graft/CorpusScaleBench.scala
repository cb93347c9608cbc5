package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-side scale run, the LLM-pipeline analog of MergeScaleBench:
  * N synthetic documents through the full near-dup chain — shingle,
  * native minhash_sig, LSH banding, exact Jaccard verify, large-star/
  * small-star connected components, canonical-keeper apply — plus one
  * scan-local winnow_sel sketch pass over the whole corpus.
  *
  * The synthetic corpus is deterministic from doc_id (SplitMix-style
  * mixing, zipf-ish vocab of 200 common + 20k rare words, 80–270 words
  * per doc); every id ≡ 9 (mod 10) is a near-copy of id−9 with the last
  * three words dropped, so the expected duplicate fraction is 10% and
  * recall is checkable at any N.
  *
  * Usage: runMain graft.CorpusScaleBench [nDocs]  (default 1,000,000)
  */
object CorpusScaleBench {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic doc text for id (near-dup pairs planted at id%10==9). */
  def docText(id: Long): String = {
    val base = if (id % 10 == 9) id - 9 else id
    var x = mix(base)
    def next(): Long = { x = mix(x); x }
    val n = 80 + (next() >>> 56).toInt / 2 * 3 // 80..270 words
    val keep = if (id % 10 == 9) n - 3 else n // near-copy drops 3 words
    val sb = new java.lang.StringBuilder(keep * 6)
    var k = 0
    while (k < keep) {
      val r = next()
      if (k > 0) sb.append(' ')
      if ((r & 7) < 5) sb.append('w').append(((r >>> 3) % 200).toString)
      else sb.append('r').append(((r >>> 3) % 20000).toString)
      k += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)

    def stage[T](tag: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $tag%-22s $sec%8.2f s")
      (r, sec)
    }

    val t0 = System.nanoTime()
    val docs = spark.range(n).as[Long]
      .mapPartitions(_.map(i => (i, docText(i)))).toDF("doc_id", "text")
    val (_, genSec) = stage("corpus gen")(docs.count())

    // near-dup pairs: shingle → minhash_sig → band → bucket join → verify
    val pairs = queries.DedupOps.minhashPairsFromDocs(spark, docs).cache()
    val (nPairs, pairSec) = stage("minhash pairs")(pairs.count())
    // sub-stage attribution on the SECOND pass (shingle cache warm): how
    // the pair bill splits between banding and the exact verify
    if (args.length > 1 && args(1) == "--stages") {
      val cand = queries.DedupOps.minhashCandidatesFromDocs(spark, docs)
      stage("  candidates (warm)")(cand.count())
      stage("  pairs (warm)")(
        queries.DedupOps.minhashPairsFromDocs(spark, docs).count())
    }

    // connected components over the pair graph (large-star/small-star)
    val nodes = docs.select(col("doc_id").as("vec_id"))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val cc = queries.DedupOps.starComponents(edges, nodes)
    val ((nClusters, rounds), ccSec) = stage("connected components") {
      (cc.labels.select("cluster_id").distinct().count(), cc.rounds)
    }

    // apply: keep the minimum doc_id per cluster, drop the rest
    val ((kept, recall), applySec) = stage("dedup apply") {
      val keepers = cc.labels.groupBy("cluster_id")
        .agg(min("vec_id").as("doc_id"))
      val k = keepers.count()
      // planted recall: id%10==9 docs must NOT be keepers (their base
      // doc has the smaller id and ≥0.6 overlap)
      val missed = keepers.filter(col("doc_id") % 10 === 9).count()
      (k, 1.0 - missed.toDouble / (n / 10).toDouble)
    }

    // one scan-local winnow sketch pass over the full corpus
    val (nSel, winnowSec) = stage("winnow sketch") {
      queries.DedupOps.winnowSelectedFromDocs(spark, docs)
        .groupBy("doc_id").count().count()
    }

    // incremental ingest, production shape: the standing corpus's band
    // index is PERSISTED state (built once here, billed separately); a
    // 5% fresh batch is shingled+signed, probed against the index, and
    // verified against only the existing docs it actually collides with.
    // The claim behind q_dedup_incremental, measured at N: batch cost
    // tracks the batch, not the corpus.
    val batch = n / 20
    val existingDocs = spark.range(batch, n).as[Long]
      .mapPartitions(_.map(i => (i, docText(i)))).toDF("doc_id", "text")
    val freshDocs = spark.range(batch).as[Long]
      .mapPartitions(_.map(i => (i, docText(i)))).toDF("doc_id", "text")
    val (index, indexSec) = stage("band index build") {
      val ix = queries.DedupOps.minhashIndex(spark, existingDocs).cache()
      ix.count()
      ix
    }
    val (nIncPairs, incSec) = stage("incremental 5% batch") {
      queries.DedupOps
        .minhashPairsAgainstIndex(spark, index, existingDocs, freshDocs)
        .count()
    }
    index.unpersist()

    val total = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"corpus_scale","n_docs":$n,"pairs":$nPairs,"clusters":$nClusters,"cc_rounds":$rounds,"kept":$kept,"planted_recall":$recall%.4f,"winnow_docs":$nSel,"inc_pairs":$nIncPairs,"gen_sec":$genSec%.1f,"pairs_sec":$pairSec%.1f,"cc_sec":$ccSec%.1f,"apply_sec":$applySec%.1f,"winnow_sec":$winnowSec%.1f,"index_sec":$indexSec%.1f,"inc_sec":$incSec%.1f,"total_sec":$total%.1f,"docs_per_sec":${n / total}%.0f}""")
    spark.stop()
  }
}
