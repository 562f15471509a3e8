package graft.core

import graft.SparkTestBase
import graft.functions.gf
import org.apache.spark.sql.functions._

/**
 * PSL algorithm vectors (the shapes from publicsuffix.org's normative
 * test set, re-derived against the embedded rule subset) + the codegen
 * expression path, including NULL propagation for bare public suffixes.
 */
class PublicSuffixSpec extends SparkTestBase {
  import spark.implicits._

  test("PSL algorithm: default rule, multi-label, wildcard, exception") {
    val cases: Seq[(String, String)] = Seq(
      // default '*' rule: bare TLD is the suffix
      ("com", null), ("example.com", "example.com"),
      ("WwW.Example.COM", "example.com"), ("example.com.", "example.com"),
      ("a.b.example.com", "example.com"),
      // unknown TLD still gets the default rule
      ("example.zz", "example.zz"), ("www.example.zz", "example.zz"),
      // multi-label ICANN suffixes
      ("co.uk", null), ("example.co.uk", "example.co.uk"),
      ("www.example.co.uk", "example.co.uk"),
      ("uk.com", "uk.com"), // no 'uk.com' rule → default over 'com'
      // wildcard *.ck: every label under ck is a suffix...
      ("ck", null), ("this.ck", null), ("foo.this.ck", "foo.this.ck"),
      // ...except the exception rule !www.ck
      ("www.ck", "www.ck"), ("a.www.ck", "www.ck"),
      // wildcard + exception with a multi-label base
      ("kawasaki.jp", null), ("ward.kawasaki.jp", null),
      ("x.ward.kawasaki.jp", "x.ward.kawasaki.jp"),
      ("city.kawasaki.jp", "city.kawasaki.jp"),
      ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
      // private-section platform suffixes split per-publisher
      ("github.io", null), ("alice.github.io", "alice.github.io"),
      ("deep.alice.github.io", "alice.github.io"),
      ("s3.amazonaws.com", null), ("bkt.s3.amazonaws.com", "bkt.s3.amazonaws.com"),
      // degenerate inputs
      (null, null), ("", null), (".", null), ("..com", null),
      ("192.168.0.1", null))
    cases.foreach { case (host, want) =>
      assert(PublicSuffix.registrableDomain(host) == want,
        s"registrableDomain($host)")
    }
    assert(PublicSuffix.publicSuffix("www.example.co.uk") == "co.uk")
    assert(PublicSuffix.publicSuffix("foo.this.ck") == "this.ck")
    assert(PublicSuffix.publicSuffix("a.www.ck") == "ck") // exception
    assert(PublicSuffix.publicSuffix("sub.city.kawasaki.jp") == "kawasaki.jp")
    assert(PublicSuffix.publicSuffix("x.example.com") == "com")
  }

  test("expression: codegen path, NULL on bare suffixes, SQL registry") {
    val df = Seq("www.example.co.uk", "a1.spam.co.uk", "a2.spam.co.uk",
      "co.uk", "b.alice.github.io").toDF("host")
    val got = df.select(gf.registrable_domain(col("host")).as("rd"))
      .collect().map(r => Option(r.getString(0)).orNull)
    assert(got.toSeq == Seq("example.co.uk", "spam.co.uk", "spam.co.uk",
      null, "alice.github.io"))
    // the budget-key property: subdomain spam collapses to ONE key
    val keys = df.select(gf.registrable_domain(col("host")).as("rd"))
      .groupBy("rd").count().collect()
      .map(r => Option(r.getString(0)).orNull -> r.getLong(1)).toMap
    assert(keys("spam.co.uk") == 2L)
    gf.register(spark)
    val viaSql = spark.sql(
      "SELECT registrable_domain('x.y.blogspot.com') AS rd").head().getString(0)
    assert(viaSql == "y.blogspot.com")
    assert(spark.sql("SELECT registrable_domain('co.uk') AS rd").head().isNullAt(0))
  }
}
