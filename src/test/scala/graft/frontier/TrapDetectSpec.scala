package graft.frontier

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TrapDetectSpec extends SparkTestBase {
  import spark.implicits._

  // a calendar trap on trap.example.com (60 urls, one body) + a healthy
  // archive on ok.example.com (60 urls, 60 bodies) + a small template
  // below minUrls that would otherwise qualify
  private def pages = {
    val trap = (0 until 60).map(i =>
      ("trap.example.com", s"https://trap.example.com/cal/2026/$i", "same-body"))
    val ok = (0 until 60).map(i =>
      ("ok.example.com", s"https://ok.example.com/post/$i", s"body-$i"))
    val small = (0 until 5).map(i =>
      ("small.example.com", s"https://small.example.com/s/$i", "dup"))
    (trap ++ ok ++ small).toDF("host", "url", "fingerprint")
  }

  test("detect flags only the high-volume duplicate-content template") {
    val out = TrapDetect.detect(pages, minUrls = 50, maxContentRatio = 0.3)
      .select("host", "template", "n_urls", "n_contents")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("trap.example.com", "https://trap.example.com/cal/{n}/{n}", 60L, 1L)))
  }

  test("repeat fetches of the same url do not inflate the url count") {
    val dup = pages.union(pages.filter($"host" === "trap.example.com"))
    val out = TrapDetect.detect(dup, minUrls = 50, maxContentRatio = 0.3)
      .select("n_urls").as[Long].collect().toSeq
    assert(out == Seq(60L)) // count_distinct, not count
  }

  test("filterTrapped drops exactly the flagged template's candidates") {
    val traps = TrapDetect.detect(pages, minUrls = 50, maxContentRatio = 0.3)
    val candidates = Seq(
      ("trap.example.com", "https://trap.example.com/cal/2027/99"), // new url, same trap
      ("trap.example.com", "https://trap.example.com/about"),       // different template
      ("ok.example.com", "https://ok.example.com/post/999")
    ).toDF("host", "url")
    val kept = TrapDetect.filterTrapped(candidates, traps)
      .select("url").as[String].collect().toSet
    assert(kept == Set("https://trap.example.com/about",
      "https://ok.example.com/post/999"))
  }
}
