package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Line-level boilerplate removal — the C4 / CCNet-style pass that strips
 * lines occurring verbatim across many documents (navigation menus,
 * cookie banners, footers) before training. A line is boilerplate when
 * its trimmed form appears in ≥ `minDocs` DISTINCT documents; cleaning
 * removes those lines and re-joins the rest in original order.
 *
 * Scale shape: doc-frequency is one explode of per-doc DISTINCT lines →
 * hash agg (map-side combinable). The boilerplate set is broadcast to
 * the cleaning join: |set| ≤ total_lines / minDocs by definition, and
 * minDocs grows with the corpus (it's a fraction-style threshold), so
 * the broadcast side stays bounded while the corpus side is scanned
 * exactly once (posexplode → anti-probe → per-doc re-agg; the re-agg
 * groups each doc's own lines — doc-sized state, no skew beyond the
 * longest document).
 */
object LineDedup {

  private def lineArr(textCol: String) =
    filter(transform(split(coalesce(col(textCol), lit("")), "\n"), l => trim(l)),
      l => l =!= "")

  /** (line, doc_freq) for lines in ≥ minDocs distinct docs. Distinctness
    * per doc is free: array_distinct before the explode, so the agg is a
    * plain count. */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
                    minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs=$minDocs: a boilerplate threshold below 2 drops everything")
    docs
      .select(explode(array_distinct(lineArr(textCol))).as("line"))
      .groupBy("line").agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
  }

  /**
   * Boilerplate-cleaned corpus: (id, n_lines, n_removed, clean_text).
   * clean_text preserves the surviving lines' original order; docs whose
   * every line is boilerplate yield an empty string (kept, not dropped —
   * dropping is a downstream filter's call).
   */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minDocs: Int): DataFrame = {
    // broadcast is safe ONLY under the scaladoc's bound: |set| ≤
    // total_lines/minDocs, which stays driver-sized only when minDocs
    // scales with the corpus (fraction-style threshold). Callers pinning
    // a small absolute minDocs at 100 TB must drop this hint.
    val bp = broadcast(frequentLines(docs, idCol, textCol, minDocs)
      .select(col("line"), lit(true).as("__bp")))
    docs
      .select(col(idCol), posexplode_outer(lineArr(textCol)).as(Seq("pos", "line")))
      .join(bp, Seq("line"), "left")
      .groupBy(idCol)
      .agg(
        count(col("line")).as("n_lines"),
        count(col("__bp")).as("n_removed"),
        array_join(transform(
          array_sort(collect_list(when(col("__bp").isNull && col("line").isNotNull,
            struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("clean_text"))
  }
}
