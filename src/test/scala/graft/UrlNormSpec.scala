package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.kernel.UrlNorm

class UrlNormSpec extends AnyFunSuite {

  test("rfc 3986 §6.2.2: case, percent-encoding and dot-segment normalization") {
    // the RFC's own §6.2.2 example: all three normalizations at once
    assert(UrlNorm.normalize("HTTP://www.EXAMPLE.com/%7esmith/./a/b/../c") ===
      "http://www.example.com/~smith/a/c")
    // unreserved escapes decode; reserved ones only uppercase
    assert(UrlNorm.normalize("http://h/%41%2f%3a") === "http://h/A%2F%3A")
    // default ports strip (scheme-aware), leading zeros strip, others stay
    assert(UrlNorm.normalize("http://h:80/x") === "http://h/x")
    assert(UrlNorm.normalize("https://h:443/x") === "https://h/x")
    assert(UrlNorm.normalize("https://h:0443/x") === "https://h/x")
    assert(UrlNorm.normalize("http://h:8080/x") === "http://h:8080/x")
    // empty path → "/", trailing slash preserved, .. clamps at root
    assert(UrlNorm.normalize("http://h") === "http://h/")
    assert(UrlNorm.normalize("http://h/a/b/") === "http://h/a/b/")
    assert(UrlNorm.normalize("http://h/../../x") === "http://h/x")
    assert(UrlNorm.normalize("http://h/a/..") === "http://h/")
  }

  test("fragments, queries, userinfo, and hostile inputs") {
    // fragments strip by default (crawl identity), kept on request
    assert(UrlNorm.normalize("http://h/p?q=1#frag") === "http://h/p?q=1")
    assert(UrlNorm.normalize("http://h/p#frag", stripFragment = false) ===
      "http://h/p#frag")
    // '#' before '?': everything after '#' is fragment
    assert(UrlNorm.normalize("http://h/p#a?b=1") === "http://h/p")
    // query sort only when asked
    assert(UrlNorm.normalize("http://h/p?b=2&a=1") === "http://h/p?b=2&a=1")
    assert(UrlNorm.normalize("http://h/p?b=2&a=1", sortQuery = true) ===
      "http://h/p?a=1&b=2")
    // userinfo preserved, host still folds
    assert(UrlNorm.normalize("ftp://User@HOST.com:21/f") === "ftp://User@host.com/f")
    // non-URLs and malformed escapes pass through, never throw
    assert(UrlNorm.normalize("not a url") === "not a url")
    assert(UrlNorm.normalize("mailto:x@y") === "mailto:x@y")
    assert(UrlNorm.normalize("http://h/%zz%4") === "http://h/%zz%4")
    assert(UrlNorm.normalize("http://h:99999999999999999999/x") ===
      "http://h:99999999999999999999/x")
    assert(UrlNorm.normalize(null) === null)
  }

  test("idempotence and fuzz: normalize(normalize(x)) == normalize(x), no throws") {
    val r = new scala.util.Random(13)
    val pool = "abzAZ09-._~%/?#:@&=+$,;!*'()[]{}|\\^\"<> é中"
    (0 until 2000).foreach { _ =>
      val s = (if (r.nextBoolean()) "http://" else "") +
        Array.fill(r.nextInt(40))(pool(r.nextInt(pool.length))).mkString
      val once = UrlNorm.normalize(s)
      assert(UrlNorm.normalize(once) === once, s"not idempotent for '$s'")
    }
  }

  test("surt: reversed host key, port kept, query sorted, junk total") {
    assert(UrlNorm.surt("https://www.example.com/a?b=1") === "com,example,www)/a?b=1")
    assert(UrlNorm.surt("HTTP://Sub.Host.ORG") === "org,host,sub)/")
    assert(UrlNorm.surt("https://example.com:8443/p") === "com,example:8443)/p")
    assert(UrlNorm.surt("http://u:pw@example.com/x") === "com,example)/x")
    // query params sort so spelling variants share a key
    assert(UrlNorm.surt("http://e.com/p?z=1&a=2") === UrlNorm.surt("http://e.com/p?a=2&z=1"))
    // fragment drops; default port drops
    assert(UrlNorm.surt("http://e.com:80/p#frag") === "com,e)/p")
    // junk comes back lowercased, never throws
    assert(UrlNorm.surt("not a url AT ALL") === "not a url at all")
    assert(UrlNorm.surt(null) === null)
  }
}
