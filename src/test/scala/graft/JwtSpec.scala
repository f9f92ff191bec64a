package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.identity.Jwt

class JwtSpec extends AnyFunSuite {
  val secret = "test-secret"

  test("sign/verify roundtrip") {
    val jwt = Jwt.sign("""{"sub":"did:key:z1"}""", secret)
    assert(jwt.count(_ == '.') == 2)
    assert(Jwt.verify(jwt, secret))
    assert(Jwt.payload(jwt).contains("""{"sub":"did:key:z1"}"""))
  }

  test("tampered signature fails") {
    val jwt = Jwt.sign("""{"sub":"x"}""", secret)
    assert(!Jwt.verify(jwt + "x", secret))
    assert(!Jwt.verify(jwt.dropRight(1), secret))
  }

  test("wrong secret fails") {
    assert(!Jwt.verify(Jwt.sign("{}", secret), "other-secret"))
  }

  test("malformed tokens fail, never throw") {
    for (bad <- Seq(null, "", "a", "a.b", "a.b.c.d", "..", "a.b.!!!"))
      assert(!Jwt.verify(bad, secret))
  }

  test("signing is deterministic") {
    assert(Jwt.sign("{}", secret) == Jwt.sign("{}", secret))
  }
}
