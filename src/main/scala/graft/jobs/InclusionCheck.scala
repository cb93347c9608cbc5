package graft.jobs

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.LongAccumulator

/** J3/P13 inclusion enrichment the way the reference actually runs it —
  * against a live execution-layer RPC endpoint rather than a pre-joined
  * blocks dim (cmd/merge/inclusioncheck.go:122-191).
  *
  * The reference shape: a pool of RPC workers shares one BlockCache keyed
  * by tx hash (inclusioncheck.go:16-50). A cache hit costs zero RPCs; a
  * miss pays `eth_getTransactionReceipt`, and an included receipt pays one
  * `eth_getBlockByHash` whose FULL tx list is folded into the cache — so
  * every later tx of that block is a free hit.
  *
  * Spark re-expression: `mapPartitions` with one resolver connection and
  * one memoized block cache per partition task (the genuine per-partition
  * imperative-I/O case — an external RPC round-trip per miss cannot be a
  * Catalyst expression). Each partition task IS a reference worker; the
  * cache lives exactly as long as the task.
  *
  * Scale note (100 TB): per-partition caches see hits only for blocks
  * co-located in their partition. Hash-partitioned input scatters each
  * block across all P partitions (worst case P×blocks block fetches), so
  * `enrich` can first `repartitionByRange` on the timestamp — mempool
  * arrival time correlates with inclusion block, so a contiguous time
  * slice touches a contiguous run of blocks and the per-partition distinct
  * block count drops to ≈ blocks/P + boundary overlap, matching the
  * reference's shared-cache fetch count while keeping P-way parallel RPC.
  * The range exchange is not wasted work: the merge DAG's final global
  * sort (O1) needs the same ordering.
  */
object InclusionCheck {

  final case class BlockInfo(number: Long, tsMs: Long, txHashes: Array[String])

  /** One live endpoint connection; one instance per partition task. */
  trait Resolver extends AutoCloseable {
    /** eth_getTransactionReceipt → containing block hash, None if pending. */
    def receiptBlockHash(txHash: String): Option[String]
    /** eth_getBlockByHash (hashes-only form) → header + tx hash list. */
    def blockByHash(blockHash: String): Option[BlockInfo]
    override def close(): Unit = ()
  }

  /** Serializable recipe shipped to executors; `open()` runs per task. */
  trait ResolverFactory extends Serializable { def open(): Resolver }

  /** The reference logs cacheHits/cacheMisses/cachedBlocks every 10k txs
    * (inclusioncheck.go:152-158); accumulators are the Spark-native
    * equivalent, merged driver-side across all partition workers. */
  final case class Stats(
      cacheHits: LongAccumulator,
      cacheMisses: LongAccumulator,
      receiptCalls: LongAccumulator,
      blockCalls: LongAccumulator)

  object Stats {
    def apply(s: SparkSession): Stats = Stats(
      s.sparkContext.longAccumulator("inclusion.cacheHits"),
      s.sparkContext.longAccumulator("inclusion.cacheMisses"),
      s.sparkContext.longAccumulator("inclusion.receiptCalls"),
      s.sparkContext.longAccumulator("inclusion.blockCalls"))
  }

  /** Append includedAtBlockHeight / includedBlockTimestamp /
    * inclusionDelayMs (same semantics and 0-defaults as the blocks-dim
    * join path in [[Merge.run]]) by querying `factory`'s endpoint, one
    * connection and one block cache per partition.
    *
    * @param timeRangePartitions when set, range-repartition on `tsCol`
    *        first so block co-locality (and thus the cache hit rate)
    *        survives hash-partitioned upstream stages — see scale note.
    * @param maxCacheEntries bound on per-partition cache population
    *        (insertion-order eviction). The reference cache is unbounded
    *        (fine for one day ≈ 7200 blocks); a bound keeps a year-scale
    *        backfill partition from holding every block header at once.
    */
  def enrich(
      df: DataFrame,
      factory: ResolverFactory,
      stats: Option[Stats] = None,
      hashCol: String = "hash",
      tsCol: String = "timestamp",
      timeRangePartitions: Option[Int] = None,
      maxCacheEntries: Int = 8 << 20): DataFrame = {
    val in = timeRangePartitions match {
      case Some(n) => df.repartitionByRange(n, col(tsCol))
      case None => df
    }
    val schema = in.schema
    val hashIdx = schema.fieldIndex(hashCol)
    val tsIdx = schema.fieldIndex(tsCol)
    val outSchema = schema
      .add("includedAtBlockHeight", LongType, nullable = false)
      .add("includedBlockTimestamp", LongType, nullable = false)
      .add("inclusionDelayMs", LongType, nullable = false)

    in.mapPartitions { rows =>
      val resolver = factory.open()
      // tx hash → (block number, block ts ms); insertion-order bounded
      val cache = new java.util.LinkedHashMap[String, (Long, Long)](1024, 0.75f) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, (Long, Long)]): Boolean =
          size() > maxCacheEntries
      }
      var hits = 0L; var misses = 0L; var receipts = 0L; var blocks = 0L
      def flushStats(): Unit = stats.foreach { st =>
        st.cacheHits.add(hits); st.cacheMisses.add(misses)
        st.receiptCalls.add(receipts); st.blockCalls.add(blocks)
        hits = 0; misses = 0; receipts = 0; blocks = 0
      }
      // Flush on TASK COMPLETION, not iterator exhaustion (ADVICE r8): a
      // downstream limit/take can abandon the iterator mid-partition, and
      // an exhaustion-only flush would silently drop that task's counts.
      // Listeners run before the task's accumulator updates are shipped.
      val tc = Option(TaskContext.get())
      tc.foreach(_.addTaskCompletionListener[Unit] { _ =>
        flushStats(); resolver.close()
      })

      val out = rows.map { row =>
        // block-fold inserts are lowercased below; lowercase the lookup key
        // too, or a checksummed input hash never hits (ADVICE r8). A null
        // hash (enrich is a public entry point; only the Merge.run path
        // filters them upstream) passes through unenriched instead of
        // NPE-failing the whole task.
        val rawHash = row.getString(hashIdx)
        if (rawHash == null)
          Row.fromSeq(row.toSeq :+ 0L :+ 0L :+ 0L)
        else {
        val hash = rawHash.toLowerCase(java.util.Locale.ROOT)
        val ts = row.getLong(tsIdx)
        var numTs = cache.get(hash)
        if (numTs != null) hits += 1
        else {
          misses += 1; receipts += 1
          numTs = resolver.receiptBlockHash(hash) match {
            case None => (0L, 0L)
            case Some(bh) =>
              blocks += 1
              resolver.blockByHash(bh) match {
                case None => (0L, 0L)
                case Some(b) =>
                  var j = 0
                  while (j < b.txHashes.length) {
                    cache.put(b.txHashes(j).toLowerCase(java.util.Locale.ROOT),
                      (b.number, b.tsMs))
                    j += 1
                  }
                  cache.put(hash, (b.number, b.tsMs)) // robust to a lagging tx list
                  (b.number, b.tsMs)
              }
          }
        }
        val delay = if (numTs._2 != 0L) numTs._2 - ts else 0L
        Row.fromSeq(row.toSeq :+ numTs._1 :+ numTs._2 :+ delay)
        }
      }

      if (tc.isDefined) out
      else new Iterator[Row] { // driver-side eval (tests): no TaskContext
        def hasNext: Boolean = {
          val more = out.hasNext
          if (!more) { flushStats(); resolver.close() }
          more
        }
        def next(): Row = out.next()
      }
    }(Encoders.row(outSchema))
  }

  /** Loopback/remote HTTP JSON-RPC resolver — the concrete endpoint shape
    * the reference dials (ethclient over geth's JSON-RPC). Block
    * `timestamp` is seconds per the Ethereum JSON-RPC spec; the reference
    * multiplies by 1000 (inclusioncheck.go:116) and so do we. */
  final case class JsonRpcFactory(
      uri: String,
      connectTimeoutMs: Int = 10000,
      readTimeoutMs: Int = 30000) extends ResolverFactory {
    def open(): Resolver = new Resolver {
      private val mapper = new ObjectMapper()
      private val url = java.net.URI.create(uri).toURL

      private def call(method: String, params: String) = {
        val conn = url.openConnection().asInstanceOf[java.net.HttpURLConnection]
        // without explicit timeouts a hung endpoint pins the partition task
        // forever (ADVICE r8) — the reference's HTTP client carries its own
        conn.setConnectTimeout(connectTimeoutMs)
        conn.setReadTimeout(readTimeoutMs)
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        val body =
          s"""{"jsonrpc":"2.0","id":1,"method":"$method","params":$params}"""
        val os = conn.getOutputStream
        try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally os.close()
        val is = conn.getInputStream
        // read to EOF, then close WITHOUT disconnect(): only a fully-
        // drained stream returns the socket to the JVM's keep-alive pool
        // (readTree alone stops at the JSON value and strands the
        // connection), so a partition's thousands of sequential calls
        // reuse one connection like the reference's pooled ethclient —
        // fresh-TCP per call measured ~10 ms/call here
        val resp = try is.readAllBytes() finally is.close()
        mapper.readTree(resp).get("result")
      }

      private def hexLong(n: com.fasterxml.jackson.databind.JsonNode): Long =
        java.lang.Long.parseLong(n.asText().stripPrefix("0x"), 16)

      def receiptBlockHash(txHash: String): Option[String] = {
        val r = call("eth_getTransactionReceipt", s"""["$txHash"]""")
        if (r == null || r.isNull) None else Some(r.get("blockHash").asText())
      }

      def blockByHash(blockHash: String): Option[BlockInfo] = {
        val r = call("eth_getBlockByHash", s"""["$blockHash",false]""")
        if (r == null || r.isNull) None
        else {
          val it = r.get("transactions").elements()
          val hashes = Array.newBuilder[String]
          while (it.hasNext) hashes += it.next().asText()
          Some(BlockInfo(hexLong(r.get("number")),
            hexLong(r.get("timestamp")) * 1000L, hashes.result()))
        }
      }
    }
  }
}
