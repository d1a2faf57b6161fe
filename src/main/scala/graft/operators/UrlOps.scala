package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL operators for web-corpus curation: host/path parsing, registrable-
 * domain extraction, and tracking-parameter detection — the provenance
 * primitives behind per-domain quotas, domain blocklists, and URL-keyed
 * dedup in C4/RefinedWeb-style pipelines.
 *
 * Everything composes codegen'd Spark builtins (`parse_url`, `split`,
 * `element_at`, `concat_ws`) — no UDFs, no shuffle of its own — so URL
 * feature extraction is a pure map-side pass over a 100 TB corpus.
 */
object UrlOps {

  /**
   * eTLD-ish multi-label public suffixes recognized by
   * [[registrableDomain]]. The real public-suffix list is thousands of
   * entries refreshed from publicsuffix.org; a production deployment
   * swaps this seed set for the full list (it stays a broadcast-free
   * plan literal either way — the `when` chain is a few string
   * comparisons per row, and the full list compiles to a static lookup
   * the same way).
   */
  val MultiLabelSuffixes: Seq[String] =
    Seq("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br", "co.in")

  /**
   * The registrable domain ("example.co.uk" from "www.example.co.uk"):
   * the last two host labels, or the last three when the last two form a
   * listed multi-label public suffix. Null host -> null.
   */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val lastTwo = concat_ws(".", element_at(labels, -2), element_at(labels, -1))
    when(size(labels) >= lit(3) && lastTwo.isin(MultiLabelSuffixes: _*),
      concat_ws(".", element_at(labels, -3), lastTwo))
      .otherwise(when(size(labels) >= lit(2), lastTwo))
  }

  /** True when the query string carries a `utm_*` tracking parameter. */
  def hasTracking(url: Column): Column =
    coalesce(try_parse_url(url, lit("QUERY")).contains("utm_"), lit(false))

  /**
   * Parse a URL column into curation features: `host`, `domain` (the
   * registrable domain), `path`, `has_tracking`, and `clean_url` (the
   * URL with any query/fragment stripped — the canonical key for
   * URL-level dedup, via `try_parse_url` — ANSI `parse_url` would fail
   * the whole job on one bad row). Unparseable URLs yield null features
   * and keep their row — a 100 TB crawl always contains junk URLs, and the
   * pipeline filters on the nulls rather than failing.
   */
  def parseUrls(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val host = try_parse_url(u, lit("HOST"))
    df.withColumn("host", host)
      .withColumn("domain", registrableDomain(host))
      .withColumn("path", try_parse_url(u, lit("PATH")))
      .withColumn("has_tracking", hasTracking(u))
      .withColumn("clean_url", regexp_replace(u, "[?#].*$", ""))
  }

  /**
   * Deterministic synthetic URL per document — the multimodal
   * `synthesizeImageContent` pattern applied to provenance: the corpus
   * tables carry no URL column, so tests and oracle queries plant one as
   * a pure function of (source, doc_id) and verify the PARSERS recover
   * the planted structure. The shape exercises every parse branch:
   * `www.`/`cdn.`/bare subdomains, single- and multi-label public
   * suffixes, and present/absent tracking query strings.
   */
  def synthesizeUrls(df: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val id = col(idCol)
    val sub = when(id % 3 === 0, lit("www."))
      .when(id % 5 === 0, lit("cdn."))
      .otherwise(lit(""))
    val tld = element_at(
      array(lit("com"), lit("org"), lit("co.uk"), lit("io")), (id % 4).cast("int") + 1)
    val query = when(id % 2 === 0,
      concat(lit("?utm_source=feed&ref=r"), (id % 9).cast("string")))
      .otherwise(lit(""))
    df.withColumn("url",
      concat(lit("https://"), sub, col(sourceCol), lit("-"), (id % 50).cast("string"),
        lit("."), tld, lit("/p"), (id % 7).cast("string"),
        lit("/doc-"), id.cast("string"), lit(".html"), query))
  }
}
