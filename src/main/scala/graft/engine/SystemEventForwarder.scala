package graft.engine

/** Remote `$system` event sink for non-owning roles
  * (syslog/forward_writer.rs): a read-only replica keeps no local
  * `$system` — it forwards each event as a single-record write to the
  * primary's HTTP API, failing over to the secondary on connection
  * errors, timeouts, and 5xx responses
  * (forward_writer.rs:66-99 execute_with_failover_policy +
  * is_failover_candidate :109-116). 4xx responses (e.g. a duplicate-ts
  * 409 on a replayed event) do NOT fail over — the primary answered.
  *
  * Wire shape (forward_writer.rs:118-147): POST
  * `{base}api/v1/b/$system/{entry}?ts={us}` with an application/json
  * body and the event's labels as `x-reduct-label-*` headers (`status`
  * always among them), authenticated with the shared `RS_API_TOKEN`.
  * Telemetry must never take serving down: failures log to stderr and
  * report false, they never throw.
  */
final class SystemEventForwarder(
    primaryUrl: Option[String],
    secondaryUrl: Option[String],
    apiToken: String,
    timeoutMs: Long = 5000L) {

  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs))
    .build()

  private def encodePath(entry: String): String =
    entry.split("/").map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20"))
      .mkString("/")

  /** Forward one event; true on a 2xx from either endpoint. */
  def send(entry: String, ts: Long, labels: Map[String, String],
      payloadJson: Array[Byte]): Boolean = {
    val bases = Seq(primaryUrl, secondaryUrl).flatten
      .map(_.trim).filter(_.nonEmpty)
    if (bases.isEmpty) {
      System.err.println("[system-forward] neither primary nor secondary " +
        "URL is configured for replica system bucket writes")
      return false
    }
    for (base <- bases) {
      try {
        var b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"${base.stripSuffix("/")}/api/v1/b/%24system/" +
              s"${encodePath(entry)}?ts=$ts"))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .header("Content-Type", "application/json")
        if (apiToken.nonEmpty)
          b = b.header("Authorization", s"Bearer $apiToken")
        for ((k, v) <- labels) b = b.header(s"x-reduct-label-$k", v)
        val resp = client.send(
          b.POST(java.net.http.HttpRequest.BodyPublishers
            .ofByteArray(payloadJson)).build(),
          java.net.http.HttpResponse.BodyHandlers.discarding())
        val code = resp.statusCode()
        if (code >= 200 && code < 300) return true
        if (code < 500) { // the primary ANSWERED: no failover (4xx is final)
          System.err.println(
            s"[system-forward] '$entry' rejected with $code by $base")
          return false
        }
        System.err.println(
          s"[system-forward] '$entry' got $code from $base, failing over")
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(
          s"[system-forward] '$entry' unreachable at $base: $e")
      }
    }
    false
  }
}

object SystemEventForwarder {
  /** `RS_PRIMARY_URL` / `RS_SECONDARY_URL` +
    * `RS_SYSTEM_EVENTS_REMOTE_TIMEOUT` (seconds). None when neither URL
    * is configured — the caller keeps its local sink then. The
    * reference's REMOTE_CA_PATH / REMOTE_VERIFY_SSL map onto the JVM's
    * standard trust-store configuration (javax.net.ssl.trustStore). */
  def fromEnv(env: Map[String, String], apiToken: String)
      : Option[SystemEventForwarder] = {
    val primary = env.get("RS_PRIMARY_URL").map(_.trim).filter(_.nonEmpty)
    val secondary = env.get("RS_SECONDARY_URL").map(_.trim).filter(_.nonEmpty)
    if (primary.isEmpty && secondary.isEmpty) None
    else Some(new SystemEventForwarder(primary, secondary, apiToken,
      timeoutMs = env.get("RS_SYSTEM_EVENTS_REMOTE_TIMEOUT")
        .flatMap(_.trim.toLongOption).filter(_ > 0)
        .map(_ * 1000L).getOrElse(5000L)))
  }
}
