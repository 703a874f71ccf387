package graft.eth

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Transport boundary for JSON-RPC: POST a body to a node URL, return
  * the response body. Production: an HTTP client; tests: canned
  * responses. Kept as a SAM trait so fixtures are one lambda.
  */
trait RpcTransport extends Serializable {
  def post(url: String, body: String): String
}

/** B20: the reference's retry-forever wrapper
  * (/root/reference/utils.py:22-30), bounded here — unbounded retry in
  * a distributed task pins an executor forever; the driver-level
  * restart loop is the right place for infinite patience.
  */
object Retry {
  def withRetry[T](attempts: Int = 5, sleepMs: Long = 5000)(f: => T): T = {
    var left = attempts
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          left -= 1
          if (left <= 0) throw e
          Thread.sleep(sleepMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** Host routing by block range — the reference routes each block to
  * the parity URL whose configured range contains it
  * (/root/reference/operations/internal_transactions.py:23-95).
  * `to = None` means open-ended.
  */
case class HostRange(url: String, from: Long, to: Option[Long]) {
  def contains(block: Long): Boolean = block >= from && to.forall(block <= _)
}

/** B3/B4: a ChainSource over batched JSON-RPC. Fetches run as
  * `mapPartitions` over the requested block numbers — Spark's executor
  * fan-out replaces the reference's `multiprocessing.Pool(3)`
  * (internal_transactions.py:206-233) — with one batched POST per
  * `batchSize` blocks per partition (the reference batches identically,
  * lines 134-167). Raw responses are parsed into rows matching the
  * fixture-source schemas, so Pipeline code is adapter-agnostic.
  */
class JsonRpcChainSource(
    @transient private val spark: SparkSession,
    transport: RpcTransport,
    hosts: Seq[HostRange],
    batchSize: Int = 1000,
    fetchPartitions: Int = 3,
    retrySleepMs: Long = 5000) extends ChainSource with Serializable {

  require(hosts.nonEmpty, "at least one host range required")

  private def hostFor(block: Long): String =
    hosts.find(_.contains(block)).getOrElse(hosts.last).url

  /** One batched JSON-RPC POST per (host, chunk). Returns `result`
    * nodes by request id order.
    */
  private def batchCall(t: RpcTransport, url: String,
      calls: Seq[(String, String)]): Seq[JsonNode] = {
    val mapper = new ObjectMapper()
    val body = calls.zipWithIndex.map { case ((method, params), i) =>
      s"""{"jsonrpc":"2.0","id":$i,"method":"$method","params":$params}"""
    }.mkString("[", ",", "]")
    val resp = Retry.withRetry(sleepMs = retrySleepMs)(t.post(url, body))
    val arr = mapper.readTree(resp)
    val byId = (0 until arr.size()).map(arr.get).map(n => n.get("id").asInt() -> n.get("result")).toMap
    calls.indices.map(byId.getOrElse(_, mapper.nullNode()))
  }

  private def hexLong(n: JsonNode, field: String): java.lang.Long =
    if (n == null || !n.has(field) || n.get(field).isNull) null
    else java.lang.Long.decode(n.get(field).asText())

  private def str(n: JsonNode, field: String): String =
    if (n == null || !n.has(field) || n.get(field).isNull) null
    else n.get(field).asText()

  /** Group request items by routed host (via `routeBlock`), chunk,
    * fetch with `method`, flatten (one RDD pass,
    * `fetchPartitions`-way parallel). Each item carries its full
    * request context through to `params`/`parse`, so range requests
    * never have to be reconstructed from a key lookup.
    */
  private def fetchItems[A: scala.reflect.ClassTag](items: Seq[A],
      routeBlock: A => Long, method: String,
      params: A => String)(parse: (A, JsonNode) => Iterator[Row])(
      schema: StructType): DataFrame = {
    val t = transport
    val bs = batchSize
    val routed = items.map(a => (hostFor(routeBlock(a)), a))
    val rdd = spark.sparkContext
      .parallelize(routed, math.min(fetchPartitions, math.max(1, routed.size)))
      .mapPartitions { it =>
        it.toSeq.groupBy(_._1).iterator.flatMap { case (url, as) =>
          as.map(_._2).grouped(bs).flatMap { chunk =>
            val results = batchCall(t, url, chunk.map(a => (method, params(a))))
            chunk.zip(results).iterator.flatMap { case (a, r) => parse(a, r) }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  private def fetch(numbers: Seq[Long], method: String,
      params: Long => String)(parse: (Long, JsonNode) => Iterator[Row])(
      schema: StructType): DataFrame =
    fetchItems[Long](numbers, identity, method, params)(parse)(schema)

  override def headBlock: Long = {
    val resp = batchCall(transport, hosts.last.url,
      Seq(("eth_blockNumber", "[]"))).head
    java.lang.Long.decode(resp.asText())
  }

  private val blockSchema = StructType(Seq(
    StructField("number", LongType, nullable = false),
    StructField("timestamp", TimestampType)))

  override def blocks(numbers: Seq[Long]): DataFrame =
    fetch(numbers, "eth_getBlockByNumber",
      n => s"""["0x${n.toHexString}",false]""") { (n, r) =>
      val ts = hexLong(r, "timestamp")
      Iterator(Row(n,
        if (ts == null) null
        else java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(ts))))
    }(blockSchema)

  private val rawTraceSchema = StructType(Seq(
    StructField("blockNumber", LongType),
    StructField("transactionHash", StringType),
    StructField("blockHash", StringType),
    StructField("type", StringType),
    StructField("error", StringType),
    StructField("traceAddress", ArrayType(IntegerType)),
    StructField("action", StructType(Seq(
      StructField("from", StringType),
      StructField("to", StringType),
      StructField("value", StringType),
      StructField("input", StringType),
      StructField("author", StringType),
      StructField("rewardType", StringType)))),
    StructField("result", StructType(Seq(
      StructField("gasUsed", StringType),
      StructField("code", StringType),
      StructField("address", StringType))))))

  override def traces(numbers: Seq[Long]): DataFrame =
    fetch(numbers, "trace_block", n => s"""["0x${n.toHexString}"]""") { (n, r) =>
      if (r == null || !r.isArray) Iterator.empty
      else (0 until r.size()).iterator.map { i =>
        val tr = r.get(i)
        val action = tr.get("action")
        val result = tr.get("result")
        val ta = tr.get("traceAddress")
        Row(n,
          str(tr, "transactionHash"), str(tr, "blockHash"),
          str(tr, "type"), str(tr, "error"),
          if (ta == null || ta.isNull) null
          else (0 until ta.size()).map(ta.get(_).asInt()),
          Row(str(action, "from"), str(action, "to"), str(action, "value"),
            str(action, "input"), str(action, "author"), str(action, "rewardType")),
          if (result == null || result.isNull) Row(null, null, null)
          else Row(str(result, "gasUsed"), str(result, "code"), str(result, "address")))
      }
    }(rawTraceSchema)

  private val txSchema = StructType(Seq(
    StructField("transactionHash", StringType),
    StructField("blockHash", StringType),
    StructField("gasPrice", StringType)))

  override def transactions(numbers: Seq[Long]): DataFrame =
    fetch(numbers, "eth_getBlockByNumber",
      n => s"""["0x${n.toHexString}",true]""") { (_, r) =>
      val txs = if (r == null) null else r.get("transactions")
      if (txs == null || !txs.isArray) Iterator.empty
      else (0 until txs.size()).iterator.map { i =>
        val tx = txs.get(i)
        Row(str(tx, "hash"), str(tx, "blockHash"), str(tx, "gasPrice"))
      }
    }(txSchema)

  private val rawEventSchema = StructType(Seq(
    StructField("blockNumber", LongType),
    StructField("transactionHash", StringType),
    StructField("blockHash", StringType),
    StructField("address", StringType),
    StructField("transactionLogIndex", StringType),
    StructField("topics", ArrayType(StringType)),
    StructField("data", StringType)))

  /** B22: one eth_getLogs per range bucket (EVENTS_RANGE_SIZE analog,
    * /root/reference/operations/events.py:12-52).
    */
  override def events(ranges: Seq[(Long, Long)]): DataFrame =
    fetchItems[(Long, Long)](ranges, _._1, "eth_getLogs", { case (start, end) =>
      s"""[{"fromBlock":"0x${start.toHexString}","toBlock":"0x${end.toHexString}"}]"""
    }) { case (_, r) =>
      if (r == null || !r.isArray) Iterator.empty
      else (0 until r.size()).iterator.map { i =>
        val ev = r.get(i)
        val topics = ev.get("topics")
        // Parity's tx-scoped transactionLogIndex is what the reference's
        // event ids are built from (operations/events.py:82); logIndex
        // (block-scoped) only as a degraded fallback for nodes without it.
        val txLogIndex = {
          val t = str(ev, "transactionLogIndex")
          if (t != null) t else str(ev, "logIndex")
        }
        Row(hexLong(ev, "blockNumber"),
          str(ev, "transactionHash"), str(ev, "blockHash"),
          str(ev, "address"), txLogIndex,
          if (topics == null || topics.isNull) null
          else (0 until topics.size()).map(topics.get(_).asText()),
          str(ev, "data"))
      }
    }(rawEventSchema)
}
