package graft.domain

import org.scalatest.funsuite.AnyFunSuite

class JwtSpec extends AnyFunSuite {

  private val secret = "test-secret"

  test("round trip: create → verify returns the claims") {
    val t = Jwt.create("alice", secret, ttlSeconds = 60, nowEpochSec = 5000)
    val claims = Jwt.verify(t, secret, nowEpochSec = 5001).get
    assert(claims("sub") == "alice")
    assert(claims("exp") == "5060")
    assert(Jwt.subject(t, secret, nowEpochSec = 5001).contains("alice"))
  }

  test("extra claims survive the round trip") {
    val t = Jwt.create("bob", secret, 60, extra = Map("role" -> "admin"), nowEpochSec = 0)
    assert(Jwt.verify(t, secret, nowEpochSec = 1).get("role") == "admin")
  }

  test("expiry: exp is exclusive — token dies exactly at exp") {
    val t = Jwt.create("alice", secret, ttlSeconds = 60, nowEpochSec = 5000)
    assert(Jwt.verify(t, secret, nowEpochSec = 5059).isDefined)
    assert(Jwt.verify(t, secret, nowEpochSec = 5060).isEmpty)
  }

  test("wrong secret, tampered payload, tampered signature all reject") {
    val t = Jwt.create("alice", secret, 3600, nowEpochSec = 0)
    assert(Jwt.verify(t, "other-secret", nowEpochSec = 1).isEmpty)
    val Array(h, p, s) = t.split('.')
    // swap the payload for a forged one claiming a different subject
    val forgedPayload = java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString("""{"sub":"mallory","exp":"9999999999"}""".getBytes("UTF-8"))
    assert(Jwt.verify(s"$h.$forgedPayload.$s", secret, nowEpochSec = 1).isEmpty)
    assert(Jwt.verify(s"$h.$p.${s.dropRight(2)}AB", secret, nowEpochSec = 1).isEmpty)
  }

  test("malformed tokens reject, never throw") {
    for (bad <- Seq("", "a", "a.b", "a.b.c.d", "!!!.###.$$$", "a.b.c"))
      assert(Jwt.verify(bad, secret).isEmpty)
  }

  test("alg confusion rejected: only HS256 headers accepted") {
    val t = Jwt.create("alice", secret, 3600, nowEpochSec = 0)
    val Array(_, p, _) = t.split('.')
    val b64 = java.util.Base64.getUrlEncoder.withoutPadding
    val noneHeader = b64.encodeToString("""{"alg":"none","typ":"JWT"}""".getBytes("UTF-8"))
    // re-sign under the none header: still rejected on the alg check
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    val sig = b64.encodeToString(mac.doFinal(s"$noneHeader.$p".getBytes("UTF-8")))
    assert(Jwt.verify(s"$noneHeader.$p.$sig", secret, nowEpochSec = 1).isEmpty)
  }

  test("subjects with JSON-special characters survive escaping") {
    val odd = "we\"ird\\back user\tname"
    val t = Jwt.create(odd, secret, 60, nowEpochSec = 0)
    assert(Jwt.subject(t, secret, nowEpochSec = 1).contains(odd))
  }
}
