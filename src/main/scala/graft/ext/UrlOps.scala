package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus dedup — the normalization every
  * crawl pipeline runs before URL-level exact dedup (C4/CommonCrawl
  * practice): the same page arrives as `HTTPS://WWW.Site.COM/p/1/`,
  * `https://site.com/p/1?utm_source=feed`, `https://site.com/p/1#nav`,
  * and counting it four times skews both dedup and per-domain quotas.
  *
  * Rules (each a deliberate, documented choice):
  *  - scheme and host lowercase; path/query case is preserved
  *    (RFC 3986 §6.2.2.1 — only scheme/host are case-insensitive);
  *  - a leading `www.` strips off the host;
  *  - the fragment drops entirely (never sent to the server);
  *  - `utm_*` tracking parameters drop; other parameters KEEP their
  *    original order (reordering would merge genuinely different URLs
  *    on servers with positional semantics);
  *  - trailing slashes collapse off the path (empty path → `/`).
  *
  * Everything is a chain of codegen'd regexp/string expressions — zero
  * shuffle, zero UDF, so canonicalization runs at scan speed and the
  * DuckDB oracle replays the identical regex chain bit-for-bit. */
object UrlOps {

  /** Lowercased host with any leading `www.` removed (empty string for
    * unparseable input). */
  def urlHost(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      "^www\\.", "")

  /** The canonical form described above. Input must carry an explicit
    * `scheme://host` prefix; anything else passes through unchanged
    * (fail-safe: an un-normalized URL is a missed merge, not data
    * loss). */
  def canonicalUrl(url: Column): Column = {
    val scheme = regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    val host = urlHost(url)
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1)
    // Split path/query FIRST so a literal "utm_" inside a path segment
    // or a parameter VALUE can never match: with the query prefixed by
    // a sentinel '&', every parameter carries its own leading separator,
    // so one global pass on "&utm_[^&]*" drops exactly the params whose
    // NAME starts with utm_ — consecutive runs included (each has its
    // own '&'), values untouched ('&q=utm_x' does not start '&utm_').
    // RE2-safe (no lookahead) so the DuckDB oracle replays it verbatim.
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val rawQuery = regexp_extract(rest, "^[^?]*[?](.*)$", 1)
    val query = regexp_replace(
      regexp_replace(concat(lit("&"), rawQuery), "&utm_[^&]*", ""), "^&", "")
    val cleanPath = regexp_replace(path, "/+$", "")
    val normPath = when(cleanPath === "", lit("/")).otherwise(cleanPath)
    when(scheme === "" || host === "", url)
      .otherwise(concat(lower(scheme), lit("://"), host, normPath,
        when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** URL-level exact dedup off the canonical form: one hash aggregation
    * keyed by the canonical URL — (canonical_url, n_variants,
    * representative) with the smallest id as the deterministic
    * representative. The aggregation is the only shuffle and it carries
    * the URL-distinct set, never the corpus. */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalUrl(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1L)).as("n_variants"), min(col(idCol)).as("representative"))

  /** Fold of [[dedupByUrl]] states — (count, min-id) is a monoid, so
    * persisted per-slice states union and re-aggregate into exactly the
    * one-shot result without re-canonicalizing any URL: the incremental
    * maintenance face for a crawl that lands in daily tiles. */
  def mergeUrlDedupStates(states: DataFrame): DataFrame =
    states.groupBy(col("canonical_url"))
      .agg(sum(col("n_variants")).as("n_variants"),
        min(col("representative")).as("representative"))
}
