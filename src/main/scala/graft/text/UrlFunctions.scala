package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL / domain curation for web-scale training corpora.
  *
  * The RefinedWeb/CCNet-style curation loop is domain-grained: parse
  * the source URL, reduce it to a registrable domain (eTLD+1), then
  * profile / blocklist / cap per domain. Everything here is a pure
  * `Column` expression (Spark's codegen'd `parse_url` + string ops) or
  * composes the existing deterministic sampling machinery — no UDFs,
  * no shuffles beyond the stated aggregations, so the family pipelines
  * with the parquet scan at any corpus size.
  *
  * The reference (rdsa-utils) has no URL machinery; this family is an
  * LLM-pipeline extension like the dedup/quality operators.
  */
object UrlFunctions {

  /** Multi-part public suffixes the eTLD+1 heuristic recognises — a
    * documented SUBSET of the public suffix list covering the dominant
    * country-commercial forms. The full PSL is a data file; callers
    * with exotic suffixes can pass their own set. */
  val defaultMultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "com.tr", "com.ar", "co.za", "com.sg", "co.nz")

  def urlProtocol(url: Column): Column = lower(parse_url(url, lit("PROTOCOL")))
  def urlHost(url: Column): Column = lower(parse_url(url, lit("HOST")))
  def urlPath(url: Column): Column = parse_url(url, lit("PATH"))

  /** Registrable domain (eTLD+1) of a host, heuristically: the last
    * two labels, or the last three when the trailing two form a known
    * multi-part public suffix. IP-literal hosts and hosts with fewer
    * than three labels pass through unchanged. Null-safe. */
  def registrableDomain(
      host: Column,
      multiPartSuffixes: Seq[String] = defaultMultiPartSuffixes): Column = {
    val h = lower(host)
    val parts = split(h, "\\.")
    val n = size(parts)
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".",
      element_at(parts, -3), element_at(parts, -2), element_at(parts, -1))
    when(h.isNull, lit(null))
      .when(h.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$"), h) // IPv4 literal
      .when(n <= 2, h)
      .when(last2.isin(multiPartSuffixes: _*), when(n >= 3, last3).otherwise(h))
      .otherwise(last2)
  }

  /** Registrable domain straight from a URL column. */
  def urlDomain(url: Column): Column = registrableDomain(urlHost(url))

  /** Corpus composition by registrable domain: (domain, n_docs),
    * descending — the curation planning signal (a fat head means a
    * handful of hosts dominate the corpus and per-domain caps matter).
    * ONE hash aggregation at domain cardinality. */
  def domainProfile(df: DataFrame, urlCol: String): DataFrame =
    df.groupBy(urlDomain(col(urlCol)).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("domain"))

  /** Drop rows whose registrable domain is on the blocklist. The list
    * is in-expression (isin) — blocklists are domain-cardinality and
    * tiny next to the corpus; for 100k+ entry lists join against a
    * broadcast frame instead. Matching is on eTLD+1, so blocking
    * "example.com" blocks every subdomain. */
  def filterBlockedDomains(
      df: DataFrame,
      urlCol: String,
      blocked: Seq[String]): DataFrame =
    if (blocked.isEmpty) df
    else df.filter(!urlDomain(col(urlCol))
      .isin(blocked.map(_.toLowerCase): _*) ||
      urlDomain(col(urlCol)).isNull)

  /** Cap the corpus at `n` docs per registrable domain,
    * deterministically (the [[graft.core.Sampling.quotaSample]] md5
    * rule keyed on `keyCol`) — the per-domain quota every web-corpus
    * recipe applies so one mirror site cannot dominate training.
    * Scale shape is quotaSample's: bounded local heaps, then an exact
    * rank window over <= n x partitions x domains rows. */
  def domainQuota(
      df: DataFrame,
      urlCol: String,
      n: Int,
      keyCol: String,
      salt: String = ""): DataFrame = {
    val tagged = df.withColumn("__graft_domain", urlDomain(col(urlCol)))
    graft.core.Sampling.quotaSample(tagged, "__graft_domain", n, keyCol, salt)
      .drop("__graft_domain")
  }
}
