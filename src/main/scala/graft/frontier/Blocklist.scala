package graft.frontier

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Domain-suffix blocklist filtering — the URL-filter stage every
 * production webtext pipeline runs first (RedPajama/Dolma/C4 drop
 * candidate urls against multi-million-entry domain lists, e.g. UT1):
 * an entry `example.com` must block `example.com` AND every subdomain
 * (`cdn.a.example.com`), which plain equality misses.
 *
 * 100 TB shape: suffix matching is JOIN-shaped, not predicate-shaped —
 * the blocklist is data (millions of rows, updated independently), so
 * compiling it into a regex/literal predicate is not an option. Each
 * candidate host explodes into its ≤ ~6 label suffixes, equi-joins the
 * blocklist on the suffix, and matched keys anti-join back. The
 * blocklist side carries no hint: AQE broadcasts it when it fits and
 * shuffles both sides when it does not (the DupClusters rule — a UT1-
 * scale list fits; a learned billion-domain list would not).
 */
object Blocklist {

  /** Host of a url (scheme-tolerant, port/path-stripped, lowercased). */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url, "^(?:[a-z][a-z0-9+.-]*://)?([^/:?#]+)", 1))

  /** All dot-suffixes of a host that a blocklist entry could match:
    * `a.b.example.com` → [a.b.example.com, b.example.com, example.com].
    * Single-label hosts yield themselves. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), greatest(size(labels) - 1, lit(1))),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /**
   * Keep the candidates whose url host matches NO blocklist domain at
   * any suffix level. `blocklist` has one `domain` column (registrable
   * domains or deeper, lowercase).
   */
  def keep(candidates: DataFrame, urlCol: String, blocklist: DataFrame): DataFrame = {
    val blocked = candidates
      .select(col(urlCol).as("__u"), explode(hostSuffixes(hostOf(col(urlCol)))).as("__sfx"))
      .join(blocklist.select(lower(col("domain")).as("__sfx")), Seq("__sfx"), "left_semi")
      .select(col("__u")).distinct()
    candidates.join(blocked, candidates(urlCol) === blocked("__u"), "left_anti")
  }

  /** The complement: candidates dropped by the list (for yield reports). */
  def dropped(candidates: DataFrame, urlCol: String, blocklist: DataFrame): DataFrame = {
    val blocked = candidates
      .select(col(urlCol).as("__u"), explode(hostSuffixes(hostOf(col(urlCol)))).as("__sfx"))
      .join(blocklist.select(lower(col("domain")).as("__sfx")), Seq("__sfx"), "left_semi")
      .select(col("__u")).distinct()
    candidates.join(blocked, candidates(urlCol) === blocked("__u"), "left_semi")
  }
}
