package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import Auth._

/** Auth stack pinned to the reference's policy/repository test scenarios
  * (auth/policy.rs tests, token_repository/repo.rs tests). */
class AuthSpec extends AnyFunSuite {

  private def repoAt(now: () => Long) = new TokenRepository("s3cret-api", now)
  private def repo() = repoAt(() => 1000000L)

  test("init token: provisioned full access from the API token") {
    val r = repo()
    val t = r.validateToken(Some("Bearer s3cret-api"))
    assert(t.name == InitTokenName && t.isProvisioned)
    assert(t.permissions.exists(_.fullAccess))
    intercept[ApiError](r.removeToken(InitTokenName)) // provisioned
    intercept[ApiError](r.rotateToken(InitTokenName))
  }

  test("create/validate/list/remove token round trip") {
    val r = repo()
    val resp = r.createToken("reader",
      Permissions(read = Seq("bucket-1", "data-*")))
    assert(resp.value.startsWith("reader-") && resp.value.length == "reader-".length + 32)
    assert(isHashedTokenSecret(r.getToken("reader").value), "only the hash is stored")
    val t = r.validateToken(Some(s"Bearer ${resp.value}"))
    assert(t.name == "reader")
    intercept[ApiError](r.validateToken(Some(s"Bearer ${resp.value}x")))
    intercept[ApiError](r.validateToken(Some(resp.value))) // no Bearer prefix
    intercept[ApiError](r.createToken("reader", Permissions())) // conflict
    intercept[ApiError](r.createToken("", Permissions()))
    intercept[ApiError](r.createToken("x", Permissions(read = Seq("bad name!"))))
    r.removeToken("reader")
    intercept[ApiError](r.getToken("reader"))
  }

  test("policy lattice: anonymous/authenticated/full/read/write") {
    val r = repo()
    val rw = r.createToken("rw", Permissions(read = Seq("b1"), write = Seq("b1")))
    val hdr = Some(s"Bearer ${rw.value}")
    r.check(None, None, AnonymousPolicy) // always passes
    intercept[ApiError](r.check(None, None, AuthenticatedPolicy))
    r.check(hdr, None, AuthenticatedPolicy)
    r.check(hdr, None, ReadAccessPolicy("b1"))
    r.check(hdr, None, WriteAccessPolicy("b1"))
    intercept[ApiError](r.check(hdr, None, ReadAccessPolicy("b2")))
    intercept[ApiError](r.check(hdr, None, FullAccessPolicy))
    r.check(Some("Bearer s3cret-api"), None, FullAccessPolicy)
    // open instance (no API token): everything allowed
    new TokenRepository("").check(None, None, FullAccessPolicy)
  }

  test("wildcard grants match by prefix but never $-system buckets") {
    assert(checkBucketPermissions(Seq("data-*"), "data-prod"))
    assert(!checkBucketPermissions(Seq("data-*"), "other"))
    assert(checkBucketPermissions(Seq("*"), "anything"))
    assert(!checkBucketPermissions(Seq("*"), "$system"))
    assert(checkBucketPermissions(Seq("$system"), "$system"), "exact $ names do match")
  }

  test("expiry, inactivity TTL, rotation, and IP allowlist") {
    var now = 1000000L
    val r = repoAt(() => now)
    intercept[ApiError] { // expiry in the past
      r.createToken("x", Permissions(), expiresAtMs = Some(now - 1))
    }
    intercept[ApiError](r.createToken("x", Permissions(), ttlSec = Some(0)))
    val exp = r.createToken("exp", Permissions(), expiresAtMs = Some(now + 5000))
    r.validateToken(Some(s"Bearer ${exp.value}"))
    now += 6000
    intercept[ApiError](r.validateToken(Some(s"Bearer ${exp.value}")))
    intercept[ApiError](r.rotateToken("exp")) // can't rotate expired
    // inactivity TTL: valid while accessed, expires after idling
    val ttl = r.createToken("idle", Permissions(), ttlSec = Some(10))
    r.validateToken(Some(s"Bearer ${ttl.value}"))
    now += 5000
    r.validateToken(Some(s"Bearer ${ttl.value}")) // refreshed last access
    now += 11000
    intercept[ApiError](r.validateToken(Some(s"Bearer ${ttl.value}")))
    // rotation invalidates the old secret
    val rot0 = r.createToken("rot", Permissions())
    val rot1 = r.rotateToken("rot")
    intercept[ApiError](r.validateToken(Some(s"Bearer ${rot0.value}")))
    r.validateToken(Some(s"Bearer ${rot1.value}"))
    // IP allowlist
    val ip = r.createToken("ip", Permissions(), ipAllowlist = Seq("10.0.0.1"))
    r.validateToken(Some(s"Bearer ${ip.value}"), Some("10.0.0.1"))
    intercept[ApiError](r.validateToken(Some(s"Bearer ${ip.value}"), Some("10.0.0.2")))
    intercept[ApiError](r.validateToken(Some(s"Bearer ${ip.value}"), None))
    // negative TTL is rejected at creation like zero (it would mint a
    // token that authenticates once then fails forever)
    intercept[ApiError](r.createToken("neg", Permissions(), ttlSec = Some(-1)))
    // the inactivity clock starts AT CREATION: a never-used token must
    // not live forever waiting for a first use to arm the check
    val unused = r.createToken("unused", Permissions(), ttlSec = Some(10))
    now += 11000
    intercept[ApiError](r.validateToken(Some(s"Bearer ${unused.value}")))
  }

  test("PBKDF2 at-rest hashing + validation cache invalidation (PR-1273)") {
    // work-factor-hardened format, iteration count self-describing
    val h = hashTokenSecret("tok-abc")
    assert(h.startsWith(s"pbkdf2-sha256$$$Pbkdf2Iterations$$"))
    assert(verifyTokenSecret(h, "tok-abc") && !verifyTokenSecret(h, "tok-abd"))
    // the legacy salted-SHA256 form still verifies (startup-migration
    // analog: a long-lived embedded repo may hold pre-upgrade hashes)
    val legacy = "sha256$" + "00" * 16 + ":" +
      java.security.MessageDigest.getInstance("SHA-256")
        .digest((new Array[Byte](16)) ++ "old-secret".getBytes("UTF-8"))
        .map(b => f"${b & 0xFF}%02x").mkString
    assert(verifyTokenSecret(legacy, "old-secret"))
    assert(!verifyTokenSecret(legacy, "wrong"))
    // cache is invalidated by every mutation: a VALIDATED (hence cached)
    // secret must die instantly on rotate and on remove
    val r = repo()
    val c0 = r.createToken("cached", Permissions())
    r.validateToken(Some(s"Bearer ${c0.value}")) // populate cache
    val c1 = r.rotateToken("cached")
    intercept[ApiError](r.validateToken(Some(s"Bearer ${c0.value}")))
    r.validateToken(Some(s"Bearer ${c1.value}"))
    r.validateToken(Some(s"Bearer ${c1.value}")) // cache-hit path
    r.removeToken("cached")
    intercept[ApiError](r.validateToken(Some(s"Bearer ${c1.value}")))
    // a cached known-bad stays bad until a mutation could change it
    intercept[ApiError](r.validateToken(Some("Bearer nope")))
    intercept[ApiError](r.validateToken(Some("Bearer nope")))
  }

  test("targeted verification: a generated secret verifies against ONE " +
      "stored hash via its name prefix, not the whole repo (DoS lever)") {
    val r = repo()
    for (i <- 0 until 6) r.createToken(s"tok$i", Permissions())
    val good = r.createToken("hot", Permissions())
    val base = r.verifyCount.get()
    r.validateToken(Some(s"Bearer ${good.value}")) // cache miss, prefixed
    assert(r.verifyCount.get() - base == 1,
      s"prefixed secret must verify exactly one hash, " +
        s"ran ${r.verifyCount.get() - base}")
    // a PREFIXED but wrong secret: targeted verify fails, full-scan
    // fallback runs once (a provisioned secret could LOOK generated),
    // verdict cached as known-bad
    val bogus = "hot-" + "0" * 32
    val b0 = r.verifyCount.get()
    intercept[ApiError](r.validateToken(Some(s"Bearer $bogus")))
    assert(r.verifyCount.get() - b0 == 1 + 7, // hot + (init + 6 + hot - hot)
      "fallback scans the rest exactly once")
    val b1 = r.verifyCount.get()
    intercept[ApiError](r.validateToken(Some(s"Bearer $bogus")))
    assert(r.verifyCount.get() == b1, "known-bad verdict must be cached")
  }

  test("provisioned secret that LOOKS generated still validates via the " +
      "full-scan fallback") {
    val r = repo()
    // secret parses to name-prefix "ghost", which is no repo token
    val secret = "ghost-" + "ab" * 16
    r.provisionToken("svc", secret, Permissions(fullAccess = true))
    assert(r.validateToken(Some(s"Bearer $secret")).name == "svc")
    // and the cache now serves it without re-verification
    val c = r.verifyCount.get()
    assert(r.validateToken(Some(s"Bearer $secret")).name == "svc")
    assert(r.verifyCount.get() == c)
  }

  test("validation cache evicts per-entry LRU under a bad-bearer flood — " +
      "hot legitimate entries survive") {
    val r = repo()
    r.validationCacheMax = 4 // spec-scale the cap; semantics unchanged
    val good = r.createToken("hot", Permissions())
    r.validateToken(Some(s"Bearer ${good.value}"))
    assert(r.isCachedCandidate(good.value))
    // 8 distinct bad bearers, touching the hot entry between them: each
    // insert evicts the LEAST-RECENTLY-USED entry, never the hot one
    for (i <- 0 until 8) {
      intercept[ApiError](r.validateToken(Some(s"Bearer flood-$i")))
      r.validateToken(Some(s"Bearer ${good.value}")) // keeps it recent
      assert(r.isCachedCandidate(good.value),
        s"hot entry evicted by bad-bearer #$i — wholesale clear is back")
    }
    // the flood itself is bounded: oldest flood entries are gone
    assert(!r.isCachedCandidate("flood-0"))
  }

  test("PBKDF2 verification runs OUTSIDE the repo monitor: cached auth " +
      "proceeds while a slow full-scan verification is in flight") {
    val r = repo()
    for (i <- 0 until 4) r.createToken(s"t$i", Permissions())
    val good = r.createToken("hot", Permissions())
    r.validateToken(Some(s"Bearer ${good.value}")) // cache it
    // no name prefix → full scan: 6 PBKDF2 verifications, several
    // hundred ms, all of which must run lock-free
    val slow = new Thread(() =>
      try r.validateToken(Some("Bearer no-prefix-bogus"))
      catch { case _: ApiError => () })
    slow.start()
    Thread.sleep(30) // slow thread is inside PBKDF2 by now
    val t0 = System.nanoTime()
    r.validateToken(Some(s"Bearer ${good.value}"))
    val cachedMs = (System.nanoTime() - t0) / 1e6
    val stillScanning = slow.isAlive
    slow.join(30000)
    // only meaningful if the scan was genuinely concurrent; with 6
    // 100k-iteration verifications it always is
    assert(stillScanning, "slow scan finished implausibly fast")
    assert(cachedMs < 100,
      f"cached validation stalled $cachedMs%.0f ms behind the scan — " +
        "PBKDF2 is back under the monitor")
  }

  test("repository survives concurrent validate/create/remove (serving pool)") {
    // Every authenticated request WRITES the repo (lastAccessMs stamp), so
    // the serving pool's threads mutate it concurrently with token CRUD; an
    // unsynchronized LinkedHashMap corrupts its link chain under this load.
    val r = new TokenRepository("s3cret-api")
    val secrets = (0 until 8).map { i =>
      r.createToken(s"t$i", Permissions(fullAccess = true)).value
    }
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (0 until 8).map { i =>
        pool.submit(new Runnable {
          def run(): Unit = try {
            var n = 0
            while (n < 500) {
              r.validateToken(Some(s"Bearer ${secrets(n % secrets.size)}"))
              if (n % 100 == i) { // interleave CRUD with the validations
                val name = s"w$i-$n"
                r.createToken(name, Permissions())
                r.removeToken(name)
              }
              n += 1
            }
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      futures.foreach(_.get())
    } finally pool.shutdownNow()
    assert(errs.isEmpty, s"concurrent repo access failed: ${errs.peek()}")
    // the original tokens all survive with a fresh lastAccessMs
    assert((0 until 8).forall(i => r.getToken(s"t$i").lastAccessMs.nonEmpty))
    assert(r.tokenList.map(_.name).count(_.startsWith("w")) === 0)
  }

  test("client IP resolution: RFC 7239 golden table + trusted-proxy gate") {
    import ClientIp._
    def ip(s: String) = java.net.InetAddress.getByName(s)
    // parse_x_forwarded_for cases (middleware.rs rstest table)
    assert(parseXForwardedFor("203.0.113.1").contains("203.0.113.1"))
    assert(parseXForwardedFor("203.0.113.1, 70.41.3.18").contains("203.0.113.1"))
    assert(parseXForwardedFor("unknown").isEmpty)
    // parse_forwarded_for cases
    assert(parseForwardedFor("for=203.0.113.43").contains("203.0.113.43"))
    assert(parseForwardedFor("for=203.0.113.43:1234").contains("203.0.113.43"))
    assert(parseForwardedFor("for=\"[2001:db8:cafe::17]\"")
      .contains("2001:db8:cafe:0:0:0:0:17")) // Java's uncompressed canonical
    assert(parseForwardedFor("by=203.0.113.60;proto=http").isEmpty)
    assert(parseForwardedFor("for=_hidden").isEmpty)
    assert(parseForwardedFor("for=192.0.2.43, for=198.51.100.17")
      .contains("192.0.2.43"))
    assert(parseForwardedFor("for=192.0.2.43, for=198.51.100.17;proto=http")
      .contains("192.0.2.43"))
    assert(parseForwardedFor("for=_hidden, for=198.51.100.17;proto=http")
      .contains("198.51.100.17"))
    // trusted-proxy gate (is_trusted_proxy_v4/v6)
    assert(isTrustedProxy(ip("127.0.0.1")) && isTrustedProxy(ip("10.1.2.3")) &&
      isTrustedProxy(ip("192.168.0.9")) && isTrustedProxy(ip("172.16.3.4")) &&
      isTrustedProxy(ip("::1")) && isTrustedProxy(ip("fc00::7")))
    assert(!isTrustedProxy(ip("198.51.100.4")) && !isTrustedProxy(ip("8.8.8.8")))
    // resolve: an untrusted peer's headers are IGNORED (spoof-proof)
    assert(ClientIp.resolve(Some(ip("198.51.100.4")),
      _ => Some("for=203.0.113.43")).contains("198.51.100.4"))
    // a trusted proxy's Forwarded / X-Forwarded-For is honored
    assert(ClientIp.resolve(Some(ip("127.0.0.1")),
      { case "Forwarded" => Some("for=203.0.113.43"); case _ => None })
      .contains("203.0.113.43"))
    assert(ClientIp.resolve(Some(ip("127.0.0.1")),
      { case "X-Forwarded-For" => Some("203.0.113.77, 198.51.100.1")
        case _ => None })
      .contains("203.0.113.77"))
    assert(ClientIp.resolve(Some(ip("127.0.0.1")), _ => None)
      .contains("127.0.0.1"))
    assert(ClientIp.resolve(None, _ => None).isEmpty)
  }
}
