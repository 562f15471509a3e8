package graft.expr

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.gf

/**
 * dust_rule: LCP-then-LCS stripping on arbitrary strings — substitution
 * middles, pure suffix/prefix edits, identical strings, empties, and
 * the overlap case where prefix consumption limits the suffix.
 */
class DustRuleSpec extends SparkTestBase {
  import spark.implicits._

  private def rule(a: String, b: String): (String, String) = {
    val r = Seq((a, b)).toDF("a", "b")
      .select(gf.dust_rule(col("a"), col("b")).as("r"))
      .select("r.alpha", "r.beta").collect()(0)
    (r.getString(0), r.getString(1))
  }

  test("rule extraction across edit shapes") {
    assert(rule("abcXdef", "abcYdef") == ("X", "Y"))       // substitution
    assert(rule("u?utm=1", "u") == ("?utm=1", ""))         // suffix strip
    assert(rule("www.ex.com/p", "ex.com/p") == ("www.", "")) // prefix strip
    assert(rule("same", "same") == ("", ""))               // identity
    assert(rule("", "x") == ("", "x"))                     // from empty
    assert(rule("aaa", "aa") == ("a", ""))                 // overlap: prefix wins
    assert(rule("a/amp/b", "a/b") == ("amp/", ""))         // internal segment
  }

  test("null propagates") {
    val r = Seq((Option("x"), Option.empty[String])).toDF("a", "b")
      .select(gf.dust_rule(col("a"), col("b")).as("r")).collect()(0)
    assert(r.isNullAt(0))
  }
}
