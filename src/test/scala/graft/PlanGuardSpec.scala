package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/**
 * Static plan guard over EVERY driver query: the PLANS_rN.md grep
 * verdict as a permanent regression test instead of a per-round manual
 * audit. Each query's DataFrame is built against sf0.001 and its
 * STATIC physical plan walked (queries that execute driver actions
 * during construction — crawl rounds, k-means seeding, CC loops — run
 * them at the tiny scale; that is the price of auditing real plans).
 *
 * Allowed exceptions, each named and justified:
 *  - BroadcastNestedLoopJoin ONLY as `crossJoin` of a 1-ROW aggregate
 *    (corpus totals / stage counters / normalizers kept in-plan instead
 *    of collected to the driver — grep `crossJoin` in src: every site
 *    joins a single-row agg). A BNLJ with a non-singleton build side
 *    cannot arise from these, and any NEW one fails by name.
 *  - SortMergeJoin ONLY where it is the robust STATIC choice and AQE
 *    re-plans at runtime: the full-outer snapshot equi-joins (SMJ is
 *    the safe full-outer strategy at 10^10 rows) and the deliberately
 *    UNHINTED dup-set joins (VERDICT r2: forcing broadcast on an
 *    unbounded drop set is the scale bug; leaving the hint off means
 *    the static plan says SMJ and AQE picks broadcast/SHJ when the set
 *    fits — that static SMJ is the documented intent, not a
 *    regression).
 *  - CartesianProduct: never.
 */
class PlanGuardSpec extends SparkTestBase {

  /** 1-row-aggregate crossJoin scalars (in-plan totals, never collected). */
  private val oneRowCrossJoinAllowed = Set(
    "q36_classify",        // keyword-total scalar
    "q38_validation",      // validation-summary totals
    "q41_prep_pipeline",   // per-stage yield counters (TextPipeline.report)
    "q42_incremental_dedup", // incremental-vs-one-shot stage counters
    "q52_prep_stack",      // six stage counters (PrepStack.scala:100-105)
    "q54_tfidf",           // doc-count N for idf (Tfidf.scala:38)
    "q55_unigram_nll",     // corpus token total (Tfidf.scala:71)
    "q59_recrawl_plan",    // plan summary totals
    "q63_dsir",            // target/raw model totals (Dsir.scala:84,89)
    "q64_semantic_decon",  // bench-blob norm scalar
    "q69_temperature_mix", // mixture normalizer scalar (Sampling.scala:111)
    "q78_bigram_nll",      // unigram total (Tfidf.scala BigramLm)
    "q103_hits",           // per-half-step L2-norm 1-row aggregates: the
                           // raw-side checkpoint (LoopProfile r5) leaves
                           // the final norm crossJoins visible in-plan
    "q108_trigram_nll",    // unigram total (Tfidf.scala TrigramLm)
    "q113_stupid_backoff", // model token total (Tfidf.scala StupidBackoff)
    "q158_pruned_quadlm",  // model token total T (Tfidf.scala PrunedQuadLm)
    "q116_kneser_ney",     // bigram-type total N1+(··) (Tfidf.scala KneserNey)
    "q118_tdigest_quantiles", // corpus doc-count scalar for the fold gate
    "q124_powerlaw",       // synthGraphEdges' node-count scalar (no loop
                           // checkpoint hides it here, unlike q76/q123)
    "q127_opic",           // Σhist+1 importance normalizer (Opic.scala:79)
    "q129_bm25",           // doc-count N + avgdl scalars (Bm25.scala:49,53)
    "q131_pmi",            // unigram/bigram total scalars
    "q132_graph_stats",    // edge/node/reciprocity 1-row counters
    "q136_ks_drift",       // cohort-size (na, nb) 1-row totals joined to
                           // the domain-bounded ECDF + the final D row
    "q140_keyness",        // cohort word-total (na, nb) 1-row scalars
    "q150_double_sweep"    // seed/farthest 1-row TakeOrdered rows joined
                           // into the single-row output
  )

  /** Static SMJ where AQE re-plans at runtime (see scaladoc). */
  private val staticSmjAllowed = Set(
    "q56_cluster_best",     // unhinted survivor anti-join vs unbounded dup set
    "q58_snapshot_diff",    // full-outer equi-join on id
    "q66_leakfree_split",   // q48 CC + unhinted component join
    "q72_recrawl_interval"  // multi-snapshot full-outer diff chain
  )

  /** UNPARTITIONED Window (= single-partition global sort) ONLY on
    * inputs bounded by the reference's contract: chains <= 10,000 rows
    * (csv_processor.py:68) — the bound is written at both call sites. */
  private val unpartitionedWindowAllowed = Set(
    "q06_batch_assign",     // W6 batch slicing (Chains.scala withBatchId shape)
    "q136_ks_drift"         // ECDF cumsum over DISTINCT doc lengths — the
                            // window input is the value domain (~600 rows by
                            // the doc-size contract), never corpus rows
  )

  /** sum(<integral> * <integral>) — the ANSI-overflow class (VERDICT r4
    * #1: q132/q152 long-product moment sums). A long×long product inside
    * an integral Sum overflows (and under ANSI, THROWS) once per-row
    * values reach ~10^9.5; the rule is cast to double BEFORE the
    * product. No query is allowed this shape; an allowlist entry would
    * need a written per-row-value bound at the call site. */
  private val sumOfIntegralProductAllowed = Set.empty[String]

  private def hasIntegralProductSum(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.Multiply
    import org.apache.spark.sql.catalyst.expressions.aggregate.Sum
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    plan.collectWithSubqueries {
      case p => p.expressions.exists(_.exists {
        case s: Sum => s.child.exists {
          case m: Multiply => integral(m.dataType)
          case _ => false
        }
        case _ => false
      })
    }.contains(true)
  }

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a.initialPlan +: walk(a.initialPlan)
    case _ => p +: (p.children.flatMap(walk) ++
      p.subqueries.flatMap(s => s +: walk(s)))
  }

  test("the sum(<integral>*<integral>) detector fires on the q132/q152 defect shape") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq(1L, 2L).toDF("c")
    assert(hasIntegralProductSum(
      df.agg(sum(col("c") * col("c"))).queryExecution.analyzed),
      "detector must flag an integral-product Sum")
    assert(!hasIntegralProductSum(
      df.agg(sum(col("c").cast("double") * col("c").cast("double")))
        .queryExecution.analyzed),
      "detector must pass the cast-before-product fix")
    assert(!hasIntegralProductSum(
      df.agg(sum(col("c"))).queryExecution.analyzed))
  }

  test("no CartesianProduct; SMJ/BNLJ only on documented patterns — every driver query") {
    val dir = "/root/testdata/sf0.001"
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plans = walk(df.queryExecution.executedPlan)
        val nodes = plans.map(_.nodeName).toSet
        if (nodes.exists(_.contains("CartesianProduct")))
          violations += s"$name: CartesianProduct"
        if (nodes.exists(_.contains("SortMergeJoin")) && !staticSmjAllowed(name))
          violations += s"$name: undocumented SortMergeJoin"
        if (nodes.exists(_.contains("BroadcastNestedLoopJoin")) &&
          !oneRowCrossJoinAllowed(name))
          violations += s"$name: undocumented BroadcastNestedLoopJoin"
        val hasGlobalWindow = plans.exists {
          case w: org.apache.spark.sql.execution.window.WindowExec =>
            w.partitionSpec.isEmpty
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
            w.partitionSpec.isEmpty
          case _ => false
        }
        if (hasGlobalWindow && !unpartitionedWindowAllowed(name))
          violations += s"$name: undocumented UNPARTITIONED Window (global sort)"
        if (hasIntegralProductSum(df.queryExecution.analyzed) &&
          !sumOfIntegralProductAllowed(name))
          violations += s"$name: sum(<integral> * <integral>) — ANSI overflow risk, cast to double before the product"
      } catch {
        case e: Exception => violations += s"$name: plan build failed: ${e.getMessage}"
      }
    }
    assert(violations.isEmpty, violations.mkString("\n"))
  }
}
