package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.core.RobotsRules
import graft.functions.gf

/** Spark-side RFC 9309: the robots_decision expression and the
  * filterAllowedRfc join are differentially tested against the pure
  * [[RobotsRules]] matcher over a cross of hosts × generated paths. */
class RobotsFilterSpec extends SparkTestBase {
  import spark.implicits._

  private val robotsA = // graftbot-specific group present
    """User-agent: graftbot
      |Disallow: /files/
      |Allow: /files/doc-1*
      |Crawl-delay: 3
      |
      |User-agent: *
      |Disallow: /
      |""".stripMargin
  private val robotsB = // * group only
    """User-agent: *
      |Disallow: /private/
      |Allow: /private/pub/
      |Disallow: /*.php$
      |Disallow: /a/*/c/
      |Allow: /tie/
      |Disallow: /tie/
      |""".stripMargin

  private val paths = (0 until 40).map { i =>
    i % 5 match {
      case 0 => s"/private/doc-$i"
      case 1 => s"/private/pub/doc-$i"
      case 2 => s"/files/doc-$i.php"
      case 3 => s"/a/x${i % 7}/c/doc-$i"
      case _ => s"/tie/doc-$i"
    }
  }

  test("robots_decision ≡ RobotsRules.decideFor for every host×path") {
    val rows = for {
      (host, txt) <- Seq("a.com" -> robotsA, "b.com" -> robotsB)
      p <- paths
    } yield (host, txt, p)
    val got = rows.toDF("host", "robots_txt", "path")
      .select(col("host"), col("path"),
        gf.robots_decision(col("robots_txt"), lit("graftbot"), col("path"))
          .as("d"))
      .select(col("host"), col("path"), col("d.allowed"), col("d.rule"),
        col("d.crawl_delay"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getBoolean(2), Option(r.getString(3)), Option(r.get(4)))).toMap
    rows.foreach { case (host, txt, p) =>
      val group = RobotsRules.groupFor(RobotsRules.parse(txt), "graftbot")
      val want = RobotsRules.decide(group, p)
      val (gotAllowed, gotRule, gotDelay) = got((host, p))
      assert(gotAllowed == want.allowed, s"$host $p")
      assert(gotRule == Option(want.rule), s"$host $p")
      assert(gotDelay == group.flatMap(_.crawlDelay), s"$host $p")
    }
    // spot-check the semantics the fixture encodes
    assert(got(("a.com", "/files/doc-12.php"))._1)   // Allow /files/doc-1* wins
    assert(!got(("a.com", "/files/doc-2.php"))._1)   // Disallow /files/
    assert(got(("a.com", "/private/doc-0"))._1)      // * group hidden
    assert(!got(("b.com", "/private/doc-0"))._1)
    assert(got(("b.com", "/private/pub/doc-1"))._1)  // longest match
    assert(!got(("b.com", "/files/doc-2.php"))._1)   // /*.php$
    assert(got(("b.com", "/tie/doc-4"))._1)          // allow wins tie
  }

  test("filterAllowedRfc keeps exactly the allowed candidates; robots-less host passes") {
    val robots = Seq(("a.com", robotsA), ("b.com", robotsB))
      .toDF("host", "robots_txt")
    val cands = (for {
      host <- Seq("a.com", "b.com", "c.com"); p <- paths
    } yield (host, s"https://$host$p")).toDF("host", "canonUrl")
    val kept = Sitemap.filterAllowedRfc(cands, robots, "graftbot")
      .select("host", "canonUrl").as[(String, String)].collect().toSet
    val want = (for {
      (host, txt) <- Seq("a.com" -> Some(robotsA), "b.com" -> Some(robotsB),
        "c.com" -> None)
      p <- paths
      if txt.forall(t => RobotsRules.decideFor(t, "graftbot", p).allowed)
    } yield (host, s"https://$host$p")).toSet
    assert(kept == want)
    assert(want.exists(_._1 == "c.com") && want.size < 120)
  }
}
