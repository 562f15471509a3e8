package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BlocklistSpec extends SparkTestBase {
  import spark.implicits._

  test("hostSuffixes: full chain, deep subdomains, single label") {
    val got = Seq("a.b.example.com", "example.com", "localhost")
      .toDF("h").select(Blocklist.hostSuffixes($"h")).as[Seq[String]]
      .collect().toSeq
    assert(got == Seq(
      Seq("a.b.example.com", "b.example.com", "example.com"),
      Seq("example.com"),
      Seq("localhost")))
  }

  test("keep/dropped: subdomains blocked, lookalike domains survive") {
    val candidates = Seq(
      "https://example.com/x",            // exact match → blocked
      "https://cdn.a.example.com/y",      // deep subdomain → blocked
      "http://notexample.com/z",          // suffix LOOKALIKE → kept
      "https://Example.COM:8080/w",       // case + port → blocked
      "https://good.org/ok"               // unrelated → kept
    ).toDF("url")
    val bl = Seq("example.com").toDF("domain")
    assert(Blocklist.keep(candidates, "url", bl)
      .as[String].collect().toSet ==
      Set("http://notexample.com/z", "https://good.org/ok"))
    assert(Blocklist.dropped(candidates, "url", bl)
      .as[String].collect().toSet ==
      Set("https://example.com/x", "https://cdn.a.example.com/y",
        "https://Example.COM:8080/w"))
  }

  test("deeper-than-registrable entries block only their subtree") {
    val candidates = Seq(
      "https://ads.site.com/a", "https://x.ads.site.com/b",
      "https://www.site.com/c").toDF("url")
    val bl = Seq("ads.site.com").toDF("domain")
    assert(Blocklist.keep(candidates, "url", bl).as[String].collect().toSet ==
      Set("https://www.site.com/c"))
  }
}
