package graft.core

import org.scalatest.funsuite.AnyFunSuite

class UrlNormalizerSpec extends AnyFunSuite {
  import UrlNormalizer._

  test("canonicalize: scheme/host lowercase, default port strip, fragment strip") {
    assert(canonicalize("HTTPS://ExAmple.COM:443/A/b#frag") == "https://example.com/A/b")
    assert(canonicalize("http://h.com:80/x") == "http://h.com/x")
    assert(canonicalize("http://h.com:8080/x") == "http://h.com:8080/x")
  }

  test("canonicalize: schemeless seeds get https (main.py:126-127 semantics)") {
    assert(canonicalize("example.com/path") == "https://example.com/path")
    assert(canonicalize("  lcca.com  ") == "https://lcca.com/")
  }

  test("canonicalize: dot segments, empty path, trailing dot host") {
    assert(canonicalize("https://a.com/x/../y/./z") == "https://a.com/y/z")
    assert(canonicalize("https://a.com") == "https://a.com/")
    assert(canonicalize("https://a.com./p") == "https://a.com/p")
    assert(canonicalize("https://a.com/a/b/..") == "https://a.com/a/")
  }

  test("canonicalize: query param sort, empty-& drop; percent normalization") {
    assert(canonicalize("https://a.com/p?b=2&a=1") == "https://a.com/p?a=1&b=2")
    assert(canonicalize("https://a.com/p?b=2&&a=1&") == "https://a.com/p?a=1&b=2")
    assert(canonicalize("https://a.com/%7Euser/%2fx%2F") == "https://a.com/~user/%2Fx%2F")
  }

  test("canonicalize is idempotent (property)") {
    val urls = Seq(
      "https://a.com/x/../y?z=1&a=2#f", "HTTP://B.com:80", "c.com/p/./q",
      "https://h.com/a%41b?x=%7e", "https://h.com//double//slash/")
    urls.foreach { u => assert(canonicalize(canonicalize(u)) == canonicalize(u)) }
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val (h, p1, p2) = (rnd.nextInt(50), rnd.nextInt(10), rnd.nextInt(1000))
      val u = s"https://h$h.com/p$p1/q${p2 % 10}?b=$p2&a=$p1"
      assert(canonicalize(canonicalize(u)) == canonicalize(u))
    }
  }

  test("resolve: RFC 3986 5.4 normal examples (base=http://a/b/c/d;p?q)") {
    val base = "http://a/b/c/d;p?q"
    assert(resolve(base, "g") == "http://a/b/c/g")
    assert(resolve(base, "./g") == "http://a/b/c/g")
    assert(resolve(base, "g/") == "http://a/b/c/g/")
    assert(resolve(base, "/g") == "http://a/g")
    assert(resolve(base, "//g") == "http://g")
    assert(resolve(base, "?y") == "http://a/b/c/d;p?y")
    assert(resolve(base, "#s") == "http://a/b/c/d;p?q#s")
    assert(resolve(base, "../g") == "http://a/b/g")
    assert(resolve(base, "../../g") == "http://a/g")
    assert(resolve(base, "g?y") == "http://a/b/c/g?y")
    assert(resolve(base, "") == base)
    assert(resolve(base, "https://x.com/z") == "https://x.com/z")
  }

  test("host extraction") {
    assert(host("https://User@Ex.COM:443/p") == "ex.com")
    assert(host("http://h.org:8080/p") == "h.org:8080")
  }
}
