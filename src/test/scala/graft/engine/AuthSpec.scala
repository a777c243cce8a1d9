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
  }
}
