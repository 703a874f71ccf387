package graft.eth

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The reference's balances serving API
  * (/root/reference/examples/balances_api/server.py:8-18) as a real
  * network endpoint over the Spark-backed [[Cli]]:
  *
  *   - `POST /balances/` — body: JSON array of addresses; response:
  *     the address → clamped-ETH-balance JSON map.
  *   - `POST /token_balances/<token>` — body: JSON array of
  *     addresses; response: the address → token-balance JSON map.
  *
  * Built on the JDK's `com.sun.net.httpserver` (no extra
  * dependencies). Requests execute sequentially on the server's
  * dispatch thread: each request is a driver-side Spark action, and
  * the driver serializes job submission anyway — concurrency belongs
  * to the cluster, not the HTTP layer. Responses are bounded by the
  * request's address list (the underlying collect is
  * payload-bounded, see [[Balances.ethBalanceMap]]).
  */
class BalancesServer(cli: Cli, port: Int = 0) {

  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/balances/", (ex: HttpExchange) =>
    handle(ex)(body => cli.balances(parseAddresses(body))))
  server.createContext("/token_balances/", (ex: HttpExchange) =>
    handle(ex) { body =>
      val token = ex.getRequestURI.getPath.stripPrefix("/token_balances/")
        .stripSuffix("/")
      if (token.isEmpty) throw new IllegalArgumentException("missing token in path")
      cli.tokenBalances(token, parseAddresses(body))
    })

  /** Start listening; returns the bound port (useful with port=0). */
  def start(): Int = {
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = server.stop(0)

  /** Request body contract of the Flask API (`request.get_json` over a
    * posted address array).
    */
  private def parseAddresses(body: String): Seq[String] = {
    val node = mapper.readTree(body)
    if (node == null || !node.isArray)
      throw new IllegalArgumentException("request body must be a JSON array of addresses")
    (0 until node.size()).map { i =>
      val e = node.get(i)
      if (!e.isTextual)
        throw new IllegalArgumentException(s"address at index $i is not a string")
      e.asText()
    }
  }

  private def renderMap(m: Map[String, Double]): String = {
    // serialize the whole map through the mapper (sorted for stable
    // output) — hand-concatenated Double.toString would emit bare
    // NaN/Infinity, which is not JSON
    val sorted = new java.util.LinkedHashMap[String, java.lang.Double]()
    m.toSeq.sortBy(_._1).foreach { case (a, b) => sorted.put(a, b) }
    mapper.writeValueAsString(sorted)
  }

  private def handle(ex: HttpExchange)(f: String => Map[String, Double]): Unit = {
    try {
      val (status, payload) =
        if (ex.getRequestMethod != "POST")
          (405, """{"error": "use POST"}""")
        else
          try {
            val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            (200, renderMap(f(body)))
          } catch {
            case e @ (_: IllegalArgumentException |
                      _: com.fasterxml.jackson.core.JacksonException) =>
              (400, s"""{"error": ${mapper.writeValueAsString(e.getMessage)}}""")
            case scala.util.control.NonFatal(e) =>
              // a failed Spark action must still answer the request —
              // an unreplied exchange surfaces as a client-side EOF
              (500, s"""{"error": ${mapper.writeValueAsString(String.valueOf(e.getMessage))}}""")
          }
      val bytes = payload.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    } finally ex.close()
  }
}
