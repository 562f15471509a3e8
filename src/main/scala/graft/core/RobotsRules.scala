package graft.core

import scala.collection.mutable.ArrayBuffer

/**
 * RFC 9309 robots.txt matcher — the full Robots Exclusion Protocol the
 * crawl tier's prefix-only filter (frontier/CrawlRound J5,
 * sources/Sitemap.parseRobots) approximates. Reference behavior:
 * `/root/reference` fetches with per-host politeness but delegates
 * robots evaluation to its HTTP client; a standalone engine needs the
 * real matcher. Implements the RFC 9309 §2 semantics as published
 * (plus the two universally-deployed metacharacters the RFC §2.2.3
 * standardizes):
 *
 *  - **groups**: consecutive `User-agent:` lines share one rule group;
 *    a crawler obeys the group whose agent token equals its product
 *    token case-insensitively (most specific = longest token wins),
 *    falling back to the `*` group; if a specific group exists the `*`
 *    group is IGNORED (RFC 9309 §2.2.1: "crawlers MUST obey the first
 *    most specific group").
 *  - **rules**: `Allow:` / `Disallow:` path patterns. `*` matches any
 *    run of characters (including `/` and the empty run); `$` at
 *    pattern end anchors the match to the path end; otherwise a
 *    pattern matches any PREFIX of the path. Empty-pattern rules are
 *    no-ops (RFC 9309 §2.2.2: "Disallow:" with no value allows all).
 *  - **precedence** (RFC 9309 §2.2.2): the matching rule with the
 *    LONGEST pattern (octet length as written) wins; an exact
 *    allow/disallow length tie resolves to Allow ("least restrictive").
 *    No matching rule ⇒ allowed.
 *  - `Crawl-delay:` is carried per group (de-facto extension the crawl
 *    tier's pacing uses); unknown directives are ignored per §2.2.4.
 *
 * Pure JVM object (no Spark imports) so it can back a codegen-fallback
 * expression ([[graft.expr.RobotsDecision]]) the same way AhoCorasick/
 * MimeSniff do: parse once per distinct robots blob, match per row.
 * Patterns are matched with linear backtracking only at `*` boundaries;
 * robots patterns are short (the RFC caps parse effort at 500 KiB of
 * file, which [[parse]] also enforces).
 */
object RobotsRules {

  final case class Rule(allow: Boolean, pattern: String)
  final case class Group(agents: Vector[String], rules: Vector[Rule],
                         crawlDelay: Option[Double])
  /** allowed + the winning rule's pattern (null when no rule matched). */
  final case class Decision(allowed: Boolean, rule: String)

  private val MaxBytes = 500 * 1024 // RFC 9309 §2.5 parse cap

  /** Parse robots.txt into rule groups. Tolerant: blank/comment lines
    * skipped, unknown directives ignored, rules before any User-agent
    * line dropped (RFC: such rules belong to no group). */
  def parse(txt0: String): Vector[Group] = {
    val txt = if (txt0.length > MaxBytes) txt0.substring(0, MaxBytes) else txt0
    val groups = ArrayBuffer.empty[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[Rule]
    var delay: Option[Double] = None
    var inAgents = false // consecutive UA lines accumulate into one group
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
    }
    txt.split("\r\n|\r|\n", -1).foreach { raw =>
      val noComment = raw.indexOf('#') match {
        case -1 => raw
        case i  => raw.substring(0, i)
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents) flush()
            if (value.nonEmpty) agents :+= value.toLowerCase
            inAgents = true
          case "allow" =>
            inAgents = false
            if (value.nonEmpty && agents.nonEmpty) rules :+= Rule(true, value)
          case "disallow" =>
            inAgents = false
            if (value.nonEmpty && agents.nonEmpty) rules :+= Rule(false, value)
          case "crawl-delay" =>
            inAgents = false
            if (agents.nonEmpty) delay = delay.orElse(value.toDoubleOption)
          case _ => inAgents = false // §2.2.4: ignore unknown directives
        }
      }
    }
    flush()
    groups.toVector
  }

  /** The group a crawler with product token `agent` must obey: the
    * case-insensitive exact agent-token match, else the `*` group, else
    * None (no group ⇒ everything allowed). Multiple groups naming the
    * same effective agent are COMBINED (RFC 9309 §2.2.1: "multiple
    * matching groups MUST be combined into one"). */
  def groupFor(groups: Vector[Group], agent: String): Option[Group] = {
    val a = agent.toLowerCase
    def combined(matched: Vector[Group], name: String): Option[Group] =
      if (matched.isEmpty) None
      else Some(Group(Vector(name), matched.flatMap(_.rules),
        matched.flatMap(_.crawlDelay).headOption))
    combined(groups.filter(_.agents.exists(t => t != "*" && t == a)), a)
      .orElse(combined(groups.filter(_.agents.contains("*")), "*"))
  }

  /** `*`/`$` pattern match against a path prefix (full path when the
    * pattern ends in `$`). */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    matchFrom(pat, 0, path, 0, anchored)
  }

  private def matchFrom(pat: String, pi: Int, path: String, si: Int,
                        anchored: Boolean): Boolean = {
    if (pi == pat.length) return !anchored || si == path.length
    pat.charAt(pi) match {
      case '*' =>
        var k = si
        while (k <= path.length) {
          if (matchFrom(pat, pi + 1, path, k, anchored)) return true
          k += 1
        }
        false
      case c =>
        si < path.length && path.charAt(si) == c &&
          matchFrom(pat, pi + 1, path, si + 1, anchored)
    }
  }

  /** Longest-match / allow-wins-tie verdict for `path` under `group`. */
  def decide(group: Option[Group], path: String): Decision = group match {
    case None => Decision(allowed = true, rule = null)
    case Some(g) =>
      var best: Rule = null
      g.rules.foreach { r =>
        if ((best == null || r.pattern.length > best.pattern.length ||
            (r.pattern.length == best.pattern.length && r.allow && !best.allow))
            && patternMatches(r.pattern, path))
          best = r
      }
      if (best == null) Decision(allowed = true, rule = null)
      else Decision(best.allow, best.pattern)
  }

  /** One-shot convenience: parse + group-select + decide. */
  def decideFor(robotsTxt: String, agent: String, path: String): Decision =
    decide(groupFor(parse(robotsTxt), agent), path)
}
