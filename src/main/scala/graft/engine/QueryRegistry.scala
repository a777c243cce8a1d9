package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Driver-side query lifecycle: the reference's push-based cursor
  * (process-global incrementing ids, TTL expiry, batched drain,
  * storage/query.rs:33-36,99-110 + query/base.rs:52-92) becomes a registry
  * of pull-based iterators over the result DataFrame. Continuous queries
  * re-arm from `last_ts + 1` when exhausted (storage/query/continuous.rs:
  * 16-84). `query links` serialize a QuerySpec with an HMAC signature and
  * expiry (reduct_base/src/msg/query_link_api.rs:10-35).
  *
  * MEMORY BOUND: an idle cursor holds its spec + a lazy local iterator
  * (at most ONE partition's fetched rows once draining starts — Spark's
  * toLocalIterator pulls partitions on demand), and the registry never
  * exceeds `maxCursors` entries (default 8192): expired cursors are
  * swept on every open/fetch, and an open at the cap is REJECTED with
  * [[QueryRegistry.TooManyQueriesException]] (HTTP 429) after a final
  * expiry sweep. Live cursors are never evicted — the reference only
  * expires, never evicts (storage/query.rs:99-110), and evicting the
  * least-recently-accessed live cursor would hand a flooding client a
  * kill-other-clients'-queries primitive: the flood holds the freshest
  * lastAccess, so the victims' valid cursors would go first and their
  * next fetch would silently return None mid-drain (ADVICE r14). The
  * cap is this library's explicit memory-DoS bound; rejection keeps it
  * O(1) per open, no scan.
  */
final class QueryRegistry(defaultTtlMs: Long = 60000L,
    maxCursors: Int = 8192) {

  final class Cursor(
      val id: Long,
      records: () => DataFrame,
      spec: QuerySpec,
      continuous: Boolean,
      ttlMs: Long) {
    @volatile private var lastAccess = System.nanoTime()
    private[QueryRegistry] def lastAccessNanos: Long = lastAccess
    private var lastTs: Option[Long] = None
    // Compiled at OPEN (parse/plan errors surface there → HTTP 422; no
    // Spark jobs run — the flood spec pins ~10 ms opens), but the
    // iterator is materialized on FIRST FETCH: toLocalIterator under
    // AQE eagerly runs the plan's upstream shuffle stages, so eager
    // init made open() pay the query's first shuffle (measured: a
    // gated 4-row sort blocked open for the full stage time; the
    // reference registers instantly and pays on read, query.rs:33-36).
    private var compiled: DataFrame = QueryEngine.query(records(), spec)
    private var iter: Iterator[Row] = null

    private def newIter(s: QuerySpec): Iterator[Row] = {
      import scala.jdk.CollectionConverters._
      QueryEngine.query(records(), s).toLocalIterator().asScala
    }

    def expired: Boolean =
      (System.nanoTime() - lastAccess) / 1000000L > ttlMs

    /** Drain up to `maxRecords`; empty result = NoContent. A continuous
      * cursor re-arms from last_ts+1 on exhaustion (continuous.rs:41-66).
      *
      * Concurrency: the cursor's monitor serializes fetches of the SAME
      * cursor only (the iterator is stateful) — the registry's expiry
      * sweep and other cursors' fetches never contend it. Time bound:
      * one fetch pulls at most one result partition through
      * toLocalIterator plus local iteration of ≤ maxRecords rows; it
      * never scans the full result set. A cursor expiring (or being
      * closed) while a fetch is in flight is benign: the in-flight fetch
      * completes against its own iterator, the NEXT registry.fetch
      * returns None. */
    def fetch(maxRecords: Int): Seq[Row] = synchronized {
      lastAccess = System.nanoTime()
      val out = Seq.newBuilder[Row]
      var n = 0
      while (n < maxRecords && ensureNext()) {
        val row = iter.next()
        lastTs = Some(row.getLong(row.fieldIndex("ts")))
        out += row
        n += 1
      }
      out.result()
    }

    private def ensureNext(): Boolean = {
      if (iter == null) {
        import scala.jdk.CollectionConverters._
        iter = compiled.toLocalIterator().asScala
        compiled = null // the iterator owns the execution from here
      }
      if (iter.hasNext) return true
      if (!continuous) return false
      // re-arm a fresh historical query from last emitted ts + 1
      val next = spec.copy(start = lastTs.map(_ + 1).orElse(spec.start))
      iter = newIter(next)
      iter.hasNext
    }
  }

  private val nextId = new AtomicLong(1)
  private val cursors = new ConcurrentHashMap[Long, Cursor]()

  /** Register a query; returns its process-global id (query.rs:33-36).
    * @throws QueryRegistry.TooManyQueriesException when the registry is
    *         at `maxCursors` live (unexpired) cursors — the caller maps
    *         this to HTTP 429; existing cursors are never evicted. */
  def open(records: () => DataFrame, spec: QuerySpec,
      continuous: Boolean = false, ttlMs: Long = defaultTtlMs): Long = {
    evictExpired()
    val id = nextId.getAndIncrement()
    val cursor = new Cursor(id, records, spec, continuous, ttlMs)
    // cap enforcement under a lock: a check-then-put race would let N
    // concurrent opens overshoot the documented bound. The check is
    // O(1); fetch/close stay lock-free on the ConcurrentHashMap.
    capLock.synchronized {
      if (cursors.size() >= maxCursors) {
        evictExpired() // a racer may have left expired entries behind
        if (cursors.size() >= maxCursors)
          throw new QueryRegistry.TooManyQueriesException(
            s"too many queries: $maxCursors cursors live; close cursors " +
              "or let them expire before opening more")
      }
      cursors.put(id, cursor)
    }
    id
  }
  private val capLock = new Object

  def fetch(id: Long, maxRecords: Int): Option[Seq[Row]] = {
    evictExpired()
    Option(cursors.get(id)).map(_.fetch(maxRecords))
  }

  def close(id: Long): Unit = cursors.remove(id)
  def size: Int = cursors.size()

  private def evictExpired(): Unit = {
    val it = cursors.entrySet().iterator()
    while (it.hasNext) if (it.next().getValue.expired) it.remove()
  }
}

object QueryRegistry {
  /** Open rejected at the cursor cap (→ HTTP 429). The registry never
    * evicts live cursors to make room (see class doc). */
  final class TooManyQueriesException(msg: String) extends RuntimeException(msg)
}

/** Shareable signed query links (query_link_api.rs:10-35): a serialized
  * QuerySpec + expiry + the target record's STRICT identity
  * (`record_entry`, `record_timestamp` — PR-1334 removed index-based
  * selection so a link always resolves the same record), HMAC-SHA256-
  * signed so the server can replay it without trusting the caller. */
object QueryLinks {

  /** What a verified link carries: the query to replay plus the exact
    * record the link points at within its results. */
  final case class LinkPayload(spec: QuerySpec, recordEntry: String,
      recordTs: Long)

  private def hmac(secret: String, payload: String): String = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    mac.doFinal(payload.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
  }

  private def enc(s: String): String =
    java.util.Base64.getUrlEncoder.encodeToString(s.getBytes("UTF-8"))
  private def dec(s: String): String =
    new String(java.util.Base64.getUrlDecoder.decode(s), "UTF-8")

  private def specJson(spec: QuerySpec, recordEntry: String,
      recordTs: Long, expiresAtMs: Long): String = {
    // full JSON string escaping incl. control chars — an entry name with
    // a newline/tab would otherwise produce invalid JSON that SIGNS fine
    // but throws at verify-time on every use of the legitimate link
    def q(s: String) = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    val fields = Seq(
      spec.start.map(v => s"\"start\":$v"),
      spec.stop.map(v => s"\"stop\":$v"),
      spec.entries.map(es => s"\"entries\":[${es.map(q).mkString(",")}]"),
      spec.when.map(w => "\"when\":" + org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.parse(w))),
      spec.bucket.map(b => s"\"bucket\":${q(b)}"),
      Some(s"\"strict\":${spec.strict}"),
      Some(s"\"only_metadata\":${spec.onlyMetadata}"),
      Some(s"\"record_entry\":${q(recordEntry)}"),
      Some(s"\"record_timestamp\":$recordTs"),
      Some(s"\"expires_at\":$expiresAtMs")).flatten
    fields.mkString("{", ",", "}")
  }

  /** Create a link token pointing at one record inside the query. */
  def sign(spec: QuerySpec, recordEntry: String, recordTs: Long,
      expiresAtMs: Long, secret: String): String = {
    val payload = enc(specJson(spec, recordEntry, recordTs, expiresAtMs))
    payload + "." + hmac(secret, payload)
  }

  /** Verify + decode; returns the payload if the signature matches and
    * the link has not expired. */
  def verify(token: String, secret: String,
      nowMs: Long = System.currentTimeMillis()): Option[LinkPayload] = {
    token.split("\\.", 2) match {
      // constant-time comparison — plain string equality leaks a
      // byte-by-byte timing side channel that allows signature forgery
      case Array(payload, sig) if java.security.MessageDigest.isEqual(
          hmac(secret, payload).getBytes("UTF-8"), sig.getBytes("UTF-8")) =>
        val json = org.json4s.jackson.JsonMethods.parse(dec(payload))
        import org.json4s._
        implicit val fmts: Formats = DefaultFormats
        val expires = (json \ "expires_at").extractOpt[Long].getOrElse(0L)
        // strict identity (PR-1334): a payload missing either identity
        // field is not a valid link, even if correctly signed
        val recordEntry = (json \ "record_entry").extractOpt[String]
        val recordTs = (json \ "record_timestamp").extractOpt[Long]
        if (expires < nowMs || recordEntry.isEmpty || recordTs.isEmpty) None
        else Some(LinkPayload(QuerySpec(
          start = (json \ "start").extractOpt[Long],
          stop = (json \ "stop").extractOpt[Long],
          // toOption: json4s extracts a missing key as Some(Nil) for Seqs
          entries = (json \ "entries").toOption
            .flatMap(_.extractOpt[Seq[String]]),
          when = (json \ "when").toOption
            .map(w => org.json4s.jackson.JsonMethods.compact(w)),
          strict = (json \ "strict").extractOpt[Boolean].getOrElse(false),
          onlyMetadata = (json \ "only_metadata").extractOpt[Boolean].getOrElse(false),
          bucket = (json \ "bucket").extractOpt[String]),
          recordEntry.get, recordTs.get))
      case _ => None
    }
  }
}
