package graft

import graft.queries.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Equivalence + bounded-rounds properties of the two connected-components
  * implementations behind the dedup clustering queries. Ground truth is a
  * local union-find whose roots are always the component minimum — the
  * same canonical labeling both distributed algorithms must produce.
  */
class DedupClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Union-find keeping the smaller root on every union, so the final
    * root of each node is exactly its component's minimum id. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val ra = find(a.toInt); val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star and min-label both match union-find on random graphs") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val m = 15 + rnd.nextInt(60)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      val nodes = (0 until n).map(_.toLong).toDF("vec_id")
      val edgeDf = edges.toDF("src", "dst")
      val sym = edgeDf.union(edgeDf.select(col("dst"), col("src")))
      val ml = labelsOf(DedupOps.minLabelComponents(sym, nodes).labels)
      val st = labelsOf(DedupOps.starComponents(edgeDf, nodes).labels)
      assert(ml == expected, s"min-label mismatch on seed $seed")
      assert(st == expected, s"star mismatch on seed $seed")
    }
  }

  test("adversarial long chain: star contraction converges in O(log n) rounds") {
    import spark.implicits._
    val n = 256 // diameter 255: min-label would need ~n/2 rounds; star must not
    val edges = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
    val nodes = (0 until n).map(_.toLong).toDF("vec_id")
    val st = DedupOps.starComponents(edges.toDF("src", "dst"), nodes)
    assert(labelsOf(st.labels).values.toSet == Set(0L)) // one component, min root
    assert(st.rounds <= 16, s"rounds=${st.rounds}, expected logarithmic in $n")
  }

  test("isolated nodes label themselves") {
    import spark.implicits._
    val nodes = (0L until 10L).toDF("vec_id")
    val edges = Seq((3L, 7L)).toDF("src", "dst")
    val st = labelsOf(DedupOps.starComponents(edges, nodes).labels)
    assert(st(7L) == 3L && st(3L) == 3L)
    assert((0 until 10).filter(i => i != 7).forall(i => st(i.toLong) == i.toLong))
  }

  test("dedup apply KEEPS a document with no embeddings row (declared semantics)") {
    // ADVICE r11: the losers anti-join and the old keeper inner-join
    // diverge exactly when a document has no embeddings row. The declared
    // semantics (and the oracle's `doc_id NOT IN losers`) is KEEP — an
    // unembedded doc can never be detected as a near-dup. Pin it on a
    // fixture where coverage does NOT hold.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup-apply-sem").toString
    try {
      Seq(
        (0L, "alpha text", "en", "web", 10L),
        (1L, "alpha text near copy", "en", "web", 15L),
        (2L, "beta", "en", "web", 4L),
        (3L, "gamma", "de", "web", 5L),
        (4L, "delta", "de", "web", 5L),
        (5L, "unembedded straggler", "fr", "web", 20L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$dir/documents.parquet")
      def oneHot(i: Int): Array[Float] =
        Array.tabulate(64)(j => if (j == i) 1f else 0f)
      // vec 0 and 1 identical (cos = 1): one near-dup pair, loser = 1.
      // Distinct one-hot axes elsewhere: cos = 0, below any threshold.
      Seq((0L, oneHot(0), 1), (1L, oneHot(0), 1), (2L, oneHot(1), 1),
        (3L, oneHot(2), 1), (4L, oneHot(3), 1))
        .toDF("vec_id", "embedding", "label")
        .write.parquet(s"$dir/embeddings.parquet")
      val out = SparkEntry.queries("q_dedup_apply")(spark, dir)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out("en") == (2L, 14L), s"en: $out") // loser doc 1 dropped
      assert(out("de") == (2L, 10L), s"de: $out")
      assert(out("fr") == (1L, 20L), s"fr: the unembedded doc must be kept")
    } finally {
      DedupOps.releasePairs(spark, dir)
      val p = java.nio.file.Paths.get(dir)
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
