package graft

import java.util.concurrent.atomic.AtomicLong
import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.jobs.{InclusionCheck, Merge}
import graft.queries.MempoolParse
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RPC-shaped inclusion enrichment (r8 brief item 5): a loopback JSON-RPC
  * server plays the execution-layer node; the mapPartitions block cache
  * must match the reference worker pool's block-level memoization
  * (cmd/merge/inclusioncheck.go) and produce byte-identical enrichment to
  * the blocks-dim join path.
  */
class InclusionCheckSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // ── fixture: 200 txs, 8 blocks of 25 txs, last quarter never included ──
  private val nTx = 200
  private val baseTs = 1700000000000L
  private def txHash(i: Int): String = f"0x${i}%064x"
  private def blockHash(b: Int): String = f"0x${0xb000 + b}%064x"
  private val included = (0 until nTx).filter(_ % 4 != 3)
  private val blockOf = included.zipWithIndex.map { case (i, k) => i -> k / 25 }.toMap
  private val nBlocks = blockOf.values.max + 1
  // block timestamps are SECOND-aligned: JSON-RPC serves seconds, the
  // resolver multiplies by 1000 (as the reference does), and parity with
  // the ms-granular join path requires the fixture to agree
  private def blockTsMs(b: Int): Long = ((baseTs + 12000L * b) / 1000L) * 1000L
  private def blockNum(b: Int): Long = 100L + b

  private val blocksByHash: Map[String, (Long, Long, Seq[String])] =
    (0 until nBlocks).map { b =>
      blockHash(b) -> ((blockNum(b), blockTsMs(b) / 1000L,
        included.filter(blockOf(_) == b).map(txHash)))
    }.toMap
  private val txToBlock: Map[String, String] =
    blockOf.map { case (i, b) => txHash(i) -> blockHash(b) }

  private def inputDf: DataFrame = {
    import spark.implicits._
    (0 until nTx).map(i => (txHash(i), baseTs + 37L * i))
      .toDF("hash", "timestamp")
  }

  private def blocksDim: DataFrame = {
    import spark.implicits._
    included.map(i => (txHash(i), blockNum(blockOf(i)), blockTsMs(blockOf(i))))
      .toDF("hash", "block_number", "block_ts_ms")
  }

  /** The join-path enrichment, verbatim Merge.run semantics. */
  private def joinPath(df: DataFrame, dim: DataFrame): DataFrame =
    df.join(broadcast(dim.select(lower(col("hash")).as("hash"),
        col("block_number"), col("block_ts_ms"))), Seq("hash"), "left")
      .withColumn("includedAtBlockHeight", coalesce(col("block_number"), lit(0L)))
      .withColumn("includedBlockTimestamp", coalesce(col("block_ts_ms"), lit(0L)))
      .withColumn("inclusionDelayMs",
        when(col("block_ts_ms").isNotNull, col("block_ts_ms") - col("timestamp"))
          .otherwise(lit(0L)))
      .drop("block_number", "block_ts_ms")

  /** In-process JSON-RPC node: eth_getTransactionReceipt +
    * eth_getBlockByHash over the fixture, with request counters. */
  private def withRpcServer[T](
      txBlock: Map[String, String] = txToBlock,
      blocks: Map[String, (Long, Long, Seq[String])] = blocksByHash)(
      body: (String, AtomicLong, AtomicLong) => T): T = {
    val receiptReqs = new AtomicLong
    val blockReqs = new AtomicLong
    val mapper = new ObjectMapper()
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val req = mapper.readTree(ex.getRequestBody)
        def one(node: com.fasterxml.jackson.databind.JsonNode): String = {
          val id = if (node.has("id")) node.get("id").asInt(1) else 1
          val result = node.get("method").asText() match {
            case "eth_getTransactionReceipt" =>
              receiptReqs.incrementAndGet()
              val h = node.get("params").get(0).asText()
              txBlock.get(h) match {
                case Some(bh) =>
                  val (num, _, _) = blocks(bh)
                  s"""{"blockHash":"$bh","blockNumber":"0x${num.toHexString}"}"""
                case None => "null"
              }
            case "eth_getBlockByHash" =>
              blockReqs.incrementAndGet()
              val bh = node.get("params").get(0).asText()
              blocks.get(bh) match {
                case Some((num, tsSec, txs)) =>
                  s"""{"number":"0x${num.toHexString}","timestamp":"0x${tsSec.toHexString}","transactions":[${txs.map(t => s""""$t"""").mkString(",")}]}"""
                case None => "null"
              }
            case m => throw new IllegalArgumentException(s"unexpected method $m")
          }
          s"""{"jsonrpc":"2.0","id":$id,"result":$result}"""
        }
        // JSON-RPC 2.0 batch: array in, array out (per-element counters)
        val resp =
          if (req.isArray) {
            val it = req.elements()
            val parts = Seq.newBuilder[String]
            while (it.hasNext) parts += one(it.next())
            parts.result().mkString("[", ",", "]")
          } else one(req)
        val bytes = resp.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/",
      receiptReqs, blockReqs)
    finally server.stop(0)
  }

  private def collectSorted(df: DataFrame): Seq[Row] =
    df.select("hash", "timestamp", "includedAtBlockHeight",
        "includedBlockTimestamp", "inclusionDelayMs")
      .orderBy("hash").collect().toSeq

  test("single partition: output matches the join path; cache accounting " +
    "equals the reference's shared-cache memoization") {
    withRpcServer() { (uri, receiptReqs, blockReqs) =>
      val stats = InclusionCheck.Stats(spark)
      // persist + count: exactly one execution of the mapPartitions (the
      // collectSorted orderBy's range-sampling job would otherwise run it
      // a second time and double the accumulators)
      val out = InclusionCheck.enrich(inputDf.repartition(1),
        InclusionCheck.JsonRpcFactory(uri), Some(stats)).persist()
      out.count()
      assert(collectSorted(out) == collectSorted(joinPath(inputDf, blocksDim)))
      out.unpersist()

      // Reference with one shared cache: each block fetched once, every
      // included tx after the first of its block is a free hit, every
      // not-included tx pays a receipt probe. One partition + one cache
      // reproduces that exactly — the "hit-rate >= reference" bar as
      // equality.
      assert(stats.blockCalls.value == nBlocks)
      assert(stats.cacheHits.value == included.size - nBlocks)
      assert(stats.receiptCalls.value == nTx - stats.cacheHits.value)
      assert(stats.cacheMisses.value == stats.receiptCalls.value)
      // the endpoint saw exactly the calls the accumulators claim
      assert(receiptReqs.get() == stats.receiptCalls.value)
      assert(blockReqs.get() == stats.blockCalls.value)
    }
  }

  test("time-range partitioning keeps block fetches near the shared-cache " +
    "floor across 4 parallel workers") {
    withRpcServer() { (uri, _, blockReqs) =>
      val stats = InclusionCheck.Stats(spark)
      // scramble upstream partitioning the way a hash-keyed stage would
      val scrambled = inputDf.repartition(8, col("hash"))
      val out = InclusionCheck.enrich(scrambled,
        InclusionCheck.JsonRpcFactory(uri), Some(stats),
        timeRangePartitions = Some(4)).persist()
      out.count()
      assert(collectSorted(out) == collectSorted(joinPath(inputDf, blocksDim)))
      out.unpersist()
      // arrival time correlates with block, so a contiguous time slice
      // touches a contiguous block run: at most P-1 blocks straddle a
      // partition boundary and are fetched twice
      assert(stats.blockCalls.value <= nBlocks + 3)
      assert(blockReqs.get() == stats.blockCalls.value)
      assert(stats.cacheHits.value >= included.size - stats.blockCalls.value)
    }
  }

  test("batched JSON-RPC resolution matches the join path and the " +
    "sequential path; blocks still fetched once each") {
    withRpcServer() { (uri, receiptReqs, blockReqs) =>
      val stats = InclusionCheck.Stats(spark)
      val out = InclusionCheck.enrich(inputDf.repartition(1),
        InclusionCheck.JsonRpcFactory(uri), Some(stats),
        rpcBatchSize = 64).persist()
      out.count()
      // value parity: the batch path may not change a single enriched cell
      assert(collectSorted(out) == collectSorted(joinPath(inputDf, blocksDim)))
      out.unpersist()
      // every distinct block is fetched exactly once (the fold still
      // de-duplicates across chunks via the cache)
      assert(blockReqs.get() == nBlocks)
      // receipts ride bulk calls: per-element count is bounded by the row
      // count (the sequential path's bound), and the chunk probe means a
      // block folded by an EARLIER chunk saves its members' receipts
      assert(receiptReqs.get() <= nTx)
      // EXACT accounting pin (ADVICE r21): the batched counters diverge
      // from the sequential path's by design (same-chunk block-mates count
      // as misses; pending hashes re-probe every chunk) — deterministic
      // for this fixture, so simulate the documented chunk walk over the
      // same single-partition row order and require equality.
      val order = inputDf.repartition(1).select("hash")
        .collect().map(_.getString(0))
      var eHits = 0L; var eMisses = 0L; var eReceipts = 0L; var eBlocks = 0L
      val cached = scala.collection.mutable.Set.empty[String]
      order.grouped(64).foreach { chunk =>
        val unresolved = scala.collection.mutable.LinkedHashSet.empty[String]
        chunk.foreach { h =>
          if (cached(h)) eHits += 1 else { eMisses += 1; unresolved += h }
        }
        eReceipts += unresolved.size
        val need = unresolved.toSeq.flatMap(txToBlock.get).distinct
        eBlocks += need.size
        need.foreach(bh => blocksByHash(bh)._3.foreach(cached += _))
      }
      assert(stats.cacheHits.value == eHits)
      assert(stats.cacheMisses.value == eMisses)
      assert(stats.receiptCalls.value == eReceipts)
      assert(stats.blockCalls.value == eBlocks)
      assert(receiptReqs.get() == eReceipts)
      assert(blockReqs.get() == eBlocks)
    }
    // eviction-hostile: chunk-local resolutions must survive a cache too
    // small to hold even one block's fold
    withRpcServer() { (uri, _, _) =>
      val out = InclusionCheck.enrich(inputDf.repartition(1),
        InclusionCheck.JsonRpcFactory(uri), None,
        maxCacheEntries = 3, rpcBatchSize = 16)
      assert(collectSorted(out) == collectSorted(joinPath(inputDf, blocksDim)))
    }
  }

  test("bounded cache under eviction still matches the join path") {
    withRpcServer() { (uri, _, _) =>
      val out = InclusionCheck.enrich(inputDf.repartition(1),
        InclusionCheck.JsonRpcFactory(uri), None, maxCacheEntries = 10)
      assert(collectSorted(out) == collectSorted(joinPath(inputDf, blocksDim)))
    }
  }

  test("checksummed (mixed-case) input hashes still hit the block cache (ADVICE r8)") {
    import spark.implicits._
    // uppercase the hex digits: the block-fold inserts are lowercase, so
    // before the lowercase-lookup fix every one of these probes missed
    val mixed = (0 until nTx)
      .map(i => (txHash(i).toUpperCase.replace("0X", "0x"), baseTs + 37L * i))
      .toDF("hash", "timestamp")
    withRpcServer() { (uri, receiptReqs, blockReqs) =>
      val stats = InclusionCheck.Stats(spark)
      val out = InclusionCheck.enrich(mixed.repartition(1),
        InclusionCheck.JsonRpcFactory(uri), Some(stats)).persist()
      out.count()
      // same shared-cache accounting as the all-lowercase run
      assert(stats.blockCalls.value == nBlocks)
      assert(stats.cacheHits.value == included.size - nBlocks)
      assert(receiptReqs.get() == stats.receiptCalls.value)
      assert(blockReqs.get() == stats.blockCalls.value)
      // and the enrichment itself matches the join path modulo case
      val got = out.withColumn("hash", lower(col("hash")))
      assert(collectSorted(got) == collectSorted(joinPath(inputDf, blocksDim)))
      out.unpersist()
    }
  }

  test("stats survive a downstream limit abandoning the iterator (ADVICE r8)") {
    withRpcServer() { (uri, _, _) =>
      val stats = InclusionCheck.Stats(spark)
      // limit(10) stops consuming mid-partition; the TaskCompletionListener
      // flush must still ship the processed rows' counts (an
      // exhaustion-only flush reported zero here)
      val n = InclusionCheck.enrich(inputDf.repartition(1),
        InclusionCheck.JsonRpcFactory(uri), Some(stats)).limit(10).count()
      assert(n == 10)
      val processed = stats.cacheHits.value + stats.cacheMisses.value
      assert(processed >= 10, s"counts dropped: $processed")
    }
  }

  test("a hung endpoint trips the read timeout instead of pinning the task") {
    // server that accepts but never answers within the window
    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        Thread.sleep(5000)
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try {
      import spark.implicits._
      val one = Seq((txHash(0), baseTs)).toDF("hash", "timestamp")
      val uri = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val t0 = System.nanoTime()
      val ex = intercept[Exception] {
        InclusionCheck.enrich(one.repartition(1),
          InclusionCheck.JsonRpcFactory(uri, readTimeoutMs = 300)).count()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      assert(sec < 4.0, s"timeout did not trip promptly ($sec s)")
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(_.isInstanceOf[java.net.SocketTimeoutException])
        || ex.getMessage.toLowerCase.contains("timed out"), ex.toString)
    } finally server.stop(0)
  }

  test("full merge DAG over the RPC path equals the blocks-dim DAG") {
    val dir = "/root/testdata/sf0.001"
    // second-aligned twin of MempoolParse.blocks so RPC seconds == dim ms.
    // The fixture dim is per-TX (rows sharing a block_number carry
    // different block_ts_ms), so the server gives every tx its own
    // single-tx block — DAG parity is this test's subject; multi-tx cache
    // accounting is covered above.
    val dim = MempoolParse.blocks(spark, dir)
      .withColumn("block_ts_ms", col("block_ts_ms") - col("block_ts_ms") % 1000)
      .cache()
    val dimRows = dim.collect()
    val bHash = dimRows.zipWithIndex
      .map { case (r, k) => r.getString(0) -> f"0x${0xf0000 + k}%064x" }.toMap
    val blocks = dimRows.map { r =>
      bHash(r.getString(0)) ->
        ((r.getLong(1), r.getLong(2) / 1000L, Seq(r.getString(0))))
    }.toMap
    val txBlock = dimRows.map(r => r.getString(0) -> bHash(r.getString(0))).toMap

    val raws = MempoolParse.rawTxs(spark, dir).cache()
    val srcs = MempoolParse.sourcelog(spark, dir)
    def run(in: Merge.Inputs): Seq[Row] =
      Merge.run(spark, in).transactions.drop("rawTx")
        .withColumn("sources", concat_ws(" ", col("sources")))
        .orderBy("hash").collect().toSeq

    val viaJoin = run(Merge.Inputs(raws, srcs, blocks = Some(dim)))
    val viaRpc = withRpcServer(txBlock, blocks) { (uri, _, _) =>
      run(Merge.Inputs(raws, srcs,
        inclusionRpc = Some(InclusionCheck.JsonRpcFactory(uri))))
    }
    assert(viaRpc == viaJoin)
    dim.unpersist(); raws.unpersist()
  }
}
