package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.RobotsRules._

/** RFC 9309 matcher: pattern semantics, precedence, group selection —
  * the published examples plus the edge cases the spec text calls out.
  * The Spark-side expression is differentially tested in
  * graft.sources (RobotsFilterSpec) against this matcher. */
class RobotsRulesSpec extends AnyFunSuite {

  // ---- pattern matching (`*` any run, `$` end anchor, else prefix) ----

  test("prefix patterns match path prefixes only") {
    assert(patternMatches("/fish", "/fish"))
    assert(patternMatches("/fish", "/fishheads/yummy.html"))
    assert(patternMatches("/fish", "/fish/salmon.html"))
    assert(!patternMatches("/fish", "/Fish.asp")) // case-sensitive
    assert(!patternMatches("/fish", "/catfish")) // prefix, not substring
    assert(!patternMatches("/fish", "/desert/fish"))
  }

  test("* matches any run of characters including / and empty") {
    assert(patternMatches("/fish*", "/fish"))
    assert(patternMatches("/fish*", "/fishheads"))
    assert(patternMatches("/*.php", "/index.php"))
    assert(patternMatches("/*.php", "/folder/filename.php"))
    assert(patternMatches("/*.php", "/folder/filename.php?parameters"))
    assert(patternMatches("/*.php", "/folder/any.php.file.html"))
    assert(!patternMatches("/*.php", "/"))
    assert(!patternMatches("/*.php", "/windows.PHP"))
    assert(patternMatches("/a/*/c/", "/a/x3/c/doc"))
    assert(patternMatches("/a/*/c/", "/a/x/y/c/doc")) // * crosses /
    assert(!patternMatches("/a/*/c/", "/a/x3/d/doc"))
  }

  test("$ anchors the match to the path end") {
    assert(patternMatches("/*.php$", "/filename.php"))
    assert(patternMatches("/*.php$", "/folder/filename.php"))
    assert(!patternMatches("/*.php$", "/filename.php?parameters"))
    assert(!patternMatches("/*.php$", "/filename.php5"))
    assert(!patternMatches("/*.php$", "/windows.PHP"))
    assert(patternMatches("/fish$", "/fish"))
    assert(!patternMatches("/fish$", "/fishheads"))
  }

  // ---- precedence: longest pattern wins; allow wins exact ties ----

  private def verdict(rules: Seq[(Boolean, String)], path: String): Decision =
    decide(Some(Group(Vector("*"),
      rules.toVector.map { case (a, p) => Rule(a, p) }, None)), path)

  test("longest matching pattern wins regardless of rule order") {
    // Google's documented example: allow /p vs disallow /
    assert(verdict(Seq(true -> "/p", false -> "/"), "/page").allowed)
    // disallow /*.htm (6) beats allow /page (5)
    val d = verdict(Seq(true -> "/page", false -> "/*.htm"), "/page.htm")
    assert(!d.allowed && d.rule == "/*.htm")
    // allow /folder/ (8) beats disallow /folder (7)
    assert(verdict(Seq(true -> "/folder/", false -> "/folder"),
      "/folder/page").allowed)
  }

  test("exact length tie resolves to allow; no match resolves to allow") {
    assert(verdict(Seq(true -> "/tie/", false -> "/tie/"), "/tie/x").allowed)
    val none = verdict(Seq(false -> "/private/"), "/public/x")
    assert(none.allowed && none.rule == null)
  }

  // ---- parsing + group selection ----

  private val txt =
    """# graft test robots
      |User-agent: alpha-bot
      |User-agent: beta-bot
      |Disallow: /shared/
      |Crawl-delay: 2.5
      |
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/pub/
      |Disallow:
      |
      |User-agent: beta-bot
      |Allow: /shared/ok/
      |Unknown-directive: ignored
      |""".stripMargin

  test("consecutive UA lines share a group; specific group hides *") {
    val gs = parse(txt)
    val alpha = groupFor(gs, "Alpha-Bot").get // case-insensitive
    assert(alpha.rules == Vector(Rule(false, "/shared/")))
    assert(alpha.crawlDelay.contains(2.5))
    // alpha obeys ONLY its group: /private/ is not disallowed for it
    assert(decide(Some(alpha), "/private/x").allowed)
    assert(!decide(Some(alpha), "/shared/x").allowed)
  }

  test("multiple groups for one agent are combined (RFC 9309 2.2.1)") {
    val beta = groupFor(parse(txt), "beta-bot").get
    assert(beta.rules.toSet ==
      Set(Rule(false, "/shared/"), Rule(true, "/shared/ok/")))
    assert(decide(Some(beta), "/shared/ok/x").allowed)
    assert(!decide(Some(beta), "/shared/other").allowed)
  }

  test("unknown agent falls back to *; empty Disallow is a no-op") {
    val g = groupFor(parse(txt), "gamma-bot").get
    assert(g.agents == Vector("*"))
    assert(!decide(Some(g), "/private/doc").allowed)
    assert(decide(Some(g), "/private/pub/doc").allowed) // 13 > 9
    assert(decide(Some(g), "/anything/else").allowed)   // empty Disallow
  }

  test("no groups at all / no matching group allows everything") {
    assert(decideFor("", "any-bot", "/x").allowed)
    assert(decideFor("User-agent: other\nDisallow: /", "my-bot", "/x").allowed)
    assert(!decideFor("User-agent: other\nDisallow: /", "other", "/x").allowed)
  }

  test("rules before any User-agent line are dropped; CRLF accepted") {
    val d = decideFor("Disallow: /\r\nUser-agent: *\r\nDisallow: /p/\r\n",
      "bot", "/q")
    assert(d.allowed) // the orphan 'Disallow: /' must not apply
    assert(!decideFor("Disallow: /\r\nUser-agent: *\r\nDisallow: /p/\r\n",
      "bot", "/p/x").allowed)
  }
}
