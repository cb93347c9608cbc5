package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Similarity search over the embedding column: brute-force cosine top-k
  * as the exact baseline (differential-tested), and a random-hyperplane
  * LSH-bucketed variant as the scale path (search only the query's bucket).
  */
object SimilarityOps {

  val defs: Map[String, QueryDef] = Map(

    // Brute-force cosine top-k of a fixed query vector (vec_id=0), exact
    // decimal accumulation for oracle parity. At scale: one scan + map-side
    // partial top-k (TakeOrderedAndProject), no full sort materialized.
    "q_sim_topk" -> QueryDef.sql(
      "brute-force cosine top-k vs query vector (exact baseline)",
      """WITH flat AS (
        |  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS v
        |  FROM embeddings, generate_series(1, 64) t(i)),
        |q AS (SELECT i, v FROM flat WHERE vec_id = 0),
        |nrm AS (SELECT vec_id, SUM(CAST(v * v AS DECIMAL(28,12))) AS n2 FROM flat GROUP BY vec_id),
        |dots AS (
        |  SELECT f.vec_id, SUM(CAST(f.v * q.v AS DECIMAL(28,12))) AS dot
        |  FROM flat f JOIN q ON f.i = q.i WHERE f.vec_id <> 0 GROUP BY f.vec_id)
        |SELECT d.vec_id,
        |  round(CAST(dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(qn.n2 AS DOUBLE))), 6) AS cos_r
        |FROM dots d JOIN nrm n ON d.vec_id = n.vec_id
        |CROSS JOIN (SELECT n2 FROM nrm WHERE vec_id = 0) qn
        |ORDER BY CAST(dot AS DOUBLE) / (sqrt(CAST(n.n2 AS DOUBLE)) * sqrt(CAST(qn.n2 AS DOUBLE))) DESC, d.vec_id
        |LIMIT 10""".stripMargin) { (s, dir) =>
      val flat = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), (col("pos") + 1).as("i"), col("col").cast("double").as("v"))
      val q = flat.filter(col("vec_id") === 0).select(col("i"), col("v").as("qv"))
      val nrm = flat.groupBy("vec_id")
        .agg(sum((col("v") * col("v")).cast(DecimalType(28, 12))).as("n2"))
      val qn = nrm.filter(col("vec_id") === 0).select(col("n2").as("qn2"))
      val dots = flat.filter(col("vec_id") =!= 0)
        .join(broadcast(q), Seq("i"))
        .groupBy("vec_id")
        .agg(sum((col("v") * col("qv")).cast(DecimalType(28, 12))).as("dot"))
      dots.join(nrm, Seq("vec_id")).crossJoin(broadcast(qn))
        .withColumn("cos", col("dot").cast("double") /
          (sqrt(col("n2").cast("double")) * sqrt(col("qn2").cast("double"))))
        .orderBy(col("cos").desc, col("vec_id"))
        .select(col("vec_id"), round(col("cos"), 6).as("cos_r"))
        .limit(10)
    },

    // LSH-bucketed ANN: 6 random hyperplanes (deterministic via seeded
    // hash), sign-pattern bucket, search only the query's bucket. The
    // 100 TB shape: bucket id is a shuffle key, each probe touches one
    // partition-group instead of the whole corpus.
    "q_sim_ann_lsh" -> QueryDef.rowsOnly(
      "ANN: random-hyperplane LSH bucket + in-bucket cosine top-k") { (s, dir) =>
      // hyperplane h, dim d weight ∈ {-1, 0, 1}: sparse ternary projection
      // derived from xxhash64 — deterministic, no stored model needed.
      def w(h: Int, i: org.apache.spark.sql.Column) =
        (pmod(xxhash64(lit(h), i), lit(3)) - 1).cast("double")
      val emb = Tables.embeddings(s, dir)
      val flat = emb.select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("i"), col("col").cast("double").as("v"))
      // 6-bit sign bucket per vector (64 buckets; multiprobe would widen recall)
      val projAggs = (0 until 6).map(h => sum(col("v") * w(h, col("i"))).as(s"p$h"))
      val sigs = flat.groupBy("vec_id").agg(projAggs.head, projAggs.tail: _*)
      val bucket = sigs.select(col("vec_id"),
        (0 until 6).map(h => when(col(s"p$h") >= 0, 1L << h).otherwise(0L))
          .reduce(_ + _).as("bucket"))
      val qb = bucket.filter(col("vec_id") === 0)
        .select(col("bucket").as("qbucket"))
      // candidates = same bucket as the query
      val cands = bucket.join(broadcast(qb), col("bucket") === col("qbucket"))
        .select("vec_id")
      // score candidates ARRAY-NATIVE with the codegen'd vec_dot
      // expression: no explode, no per-candidate aggregation shuffle —
      // one broadcast of the query vector and a narrow scan
      graft.functions.GraftFunctions.register(s)
      import graft.functions.VecOps.vec_dot
      val qEmb = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      emb.join(cands, Seq("vec_id")).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qEmb))
        .withColumn("cos",
          vec_dot(col("embedding"), col("q_emb")) /
            sqrt(vec_dot(col("embedding"), col("embedding")))) // q-norm cancels
        .orderBy(col("cos").desc, col("vec_id"))
        .select(col("vec_id"), round(col("cos"), 6).as("score"))
        .limit(10)
    },

    // IVF ANN: k-means coarse quantizer (deterministic seed = first k
    // vectors, 2 Lloyd iterations, exact-decimal means) → inverted lists
    // keyed by centroid → probe the nprobe=2 nearest lists only. The
    // 100 TB shape: lists are partition keys; a query touches nprobe
    // partition-groups, and the quantizer trains on a deterministic 25%
    // sample (vec_id % 4 == 0) — training cost is a fixed fraction of the
    // corpus, and the full corpus is assigned exactly once.
    "q_sim_ann_ivf" -> QueryDef.rowsOnly(
      "ANN: IVF coarse quantizer (k=8, 2 Lloyd iters, sample-trained) + nprobe=2 search") { (s, dir) =>
      val k = 8
      val flat = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("i"), col("col").cast("double").as("v"))
        .cache()
      val train = flat.filter(pmod(col("vec_id"), lit(4)) === 0)

      // deterministic init: centroids = the first k vectors
      var centroids = flat.filter(col("vec_id") < k)
        .select(col("vec_id").as("c"), col("i"), col("v").as("m"))

      def assign(rows: org.apache.spark.sql.DataFrame,
          cents: org.apache.spark.sql.DataFrame) =
        rows.join(broadcast(cents), Seq("i"))
          .groupBy("vec_id", "c")
          .agg(sum((col("v") - col("m")) * (col("v") - col("m"))).as("d2"))
          .groupBy("vec_id")
          .agg(min(struct(col("d2"), col("c"))).as("best"))
          .select(col("vec_id"), col("best.c").as("c"))

      // 2 Lloyd iterations over the SAMPLE only; means via exact decimal
      // sums so assignments are reproducible run-to-run
      for (_ <- 1 to 2) {
        val asg = assign(train, centroids)
        centroids = train.join(asg, Seq("vec_id"))
          .groupBy("c", "i")
          .agg((sum(col("v").cast(DecimalType(28, 12))).cast("double") /
            count(lit(1))).as("m"))
      }
      val lists = assign(flat, centroids).cache() // inverted lists: vec_id → c

      // query = vec 0: its nprobe nearest centroids
      val q = flat.filter(col("vec_id") === 0).select(col("i"), col("v").as("qv"))
      val probes = broadcast(q).join(centroids, Seq("i"))
        .groupBy("c")
        .agg(sum((col("qv") - col("m")) * (col("qv") - col("m"))).as("d2"))
        .orderBy(col("d2"), col("c")).limit(2)
        .select("c")

      val cands = lists.join(broadcast(probes), Seq("c")).select("vec_id")
      // array-native candidate scoring (codegen'd vec_dot, no explode)
      graft.functions.GraftFunctions.register(s)
      import graft.functions.VecOps.vec_dot
      val qEmb = Tables.embeddings(s, dir).filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"))
      Tables.embeddings(s, dir)
        .join(cands, Seq("vec_id")).filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qEmb))
        .withColumn("cos",
          vec_dot(col("embedding"), col("q_emb")) /
            sqrt(vec_dot(col("embedding"), col("embedding"))))
        .orderBy(col("cos").desc, col("vec_id"))
        .select(col("vec_id"), round(col("cos"), 6).as("score"))
        .limit(10)
    }
  )
}
