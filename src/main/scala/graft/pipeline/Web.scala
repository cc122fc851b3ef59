package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-corpus URL hygiene: canonicalization and per-domain rollups —
  * the first pass of every CommonCrawl-style pipeline (dedup by
  * canonical URL, blocklist by registered domain, per-domain quality
  * budgets). All map-only expressions + one partial-aggregated
  * groupBy; nothing here ever shuffles the raw page payload.
  */
object Web {

  /** Canonical form of a URL: lowercase, scheme dropped, leading
    * `www.` dropped, query string and fragment dropped, trailing
    * slashes collapsed. Pure codegen'd string expressions — no UDF —
    * so it rides inside whole-stage codegen next to the scan.
    *
    * Deliberately conservative: query params are dropped wholesale
    * (the aggressive variant keeps a param allowlist; for dedup
    * keying the drop-all form is the standard first pass).
    */
  def canonicalUrl(url: Column): Column = {
    val lc = lower(url)
    val noScheme = regexp_replace(lc, "^[a-z][a-z0-9+.-]*://", "")
    val noWww = regexp_replace(noScheme, "^www\\.", "")
    val noQf = regexp_replace(noWww, "[?#].*$", "")
    regexp_replace(noQf, "/+$", "")
  }

  /** Host part of a canonical URL (text before the first `/`). */
  def host(canonical: Column): Column =
    regexp_replace(canonical, "/.*$", "")

  /** Registered domain: the last two dot-labels of the host — the
    * eTLD+1 approximation without a public-suffix list (a PSL lookup
    * is a broadcast join against the ~10k-row suffix table; the
    * two-label form is the dependency-free default and exact for
    * .com/.org-class hosts).
    */
  def registeredDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)

  /** Per-registered-domain corpus rollup over a URL-keyed corpus:
    * distinct hosts, page count, total payload chars. The host
    * distinct is a TWO-LEVEL aggregation ((domain, host) partial agg,
    * then domain) — never a countDistinct Expand, the same discipline
    * as rt1/fn1. At 100 TB both aggs partial-combine map-side and the
    * second input is |distinct hosts| rows, not pages.
    */
  def domainStats(pages: DataFrame, urlCol: String,
      charsCol: String): DataFrame = {
    val canon = pages.withColumn("__host",
      host(canonicalUrl(col(urlCol))))
    val perHost = canon
      .groupBy(registeredDomain(col("__host")).as("domain"), col("__host"))
      .agg(count(lit(1)).as("__pages"), sum(col(charsCol)).as("__chars"))
    perHost.groupBy("domain")
      .agg(count(lit(1)).as("n_hosts"),
        sum("__pages").as("n_pages"),
        sum("__chars").as("total_chars"))
  }
}
