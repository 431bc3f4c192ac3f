package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL toolkit for crawl-scale corpus curation: canonicalization, domain
  * extraction, blocklist filtering, and URL-keyed deduplication.
  *
  * Every transform is a pure Column expression chain (codegen'd narrow
  * maps — no UDF, no shuffle), built from a regex subset that behaves
  * identically in Java regex and RE2/DuckDB, so each face is
  * DuckDB-oracle-checkable (the [[Pipeline.redactPii]] portability
  * contract).
  *
  * At 100 TB the URL column rides the document scan: normalization and
  * domain extraction cost nothing beyond the scan itself; the blocklist
  * filter is a broadcast anti join (blocklists are ~MB against a ~TB
  * corpus); URL dedup is one hash shuffle of (url_hash, preference) pairs
  * — never the document bodies (the [[Dedup.exact]] shape).
  */
object Urls {

  /** Lowercased host: authority minus userinfo and port. Empty string when
    * the value does not parse as an absolute URL.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Registrable domain, approximated as the last two dot-labels of the
    * host (`a.b.example.com` → `example.com`). A production deployment
    * swaps in the Public Suffix List (a broadcast lookup over reversed
    * host labels); the two-label heuristic keeps this face join-free and
    * engine-portable, and is exact for generic TLDs.
    */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    when(h.rlike("\\."), regexp_extract(h, "([^.]+\\.[^.]+)$", 1))
      .otherwise(h)
  }

  /** Canonical URL for dedup keying:
    *  - scheme and host lowercased, `www.` and userinfo dropped,
    *  - default ports (`:80`, `:443`) dropped, other ports kept,
    *  - fragment dropped,
    *  - tracking parameters (`utm_*`, `gclid`, `fbclid`, `msclkid`,
    *    `ref`, `ref_src`) dropped, with separator cleanup,
    *  - empty query (`?`) and bare trailing `/` path dropped.
    *
    * Path and non-tracking query text keep their case (paths are
    * case-sensitive on most origins).
    */
  def normalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val h = regexp_replace(host(url), "^www\\.", "")
    // non-default explicit port, kept verbatim (":8080"), else ""
    val port = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*?(:[0-9]+)(?:[/?#]|$)", 1)
    val keptPort = when(port.isin(":80", ":443"), lit("")).otherwise(port)
    // path (no query) and query (after the first '?'), fragment off —
    // tracking-param removal must touch ONLY whole query parameters:
    // an unanchored match would eat into '?href=...' / '?xref=...' and
    // strip Amazon-style '/ref=...' path segments, collapsing distinct
    // URLs onto one corrupted dedup key
    val path = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    val query = regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^?#]*\\?([^#]*)", 1)
    // prepend '&' so every parameter is '&name=value', drop tracking
    // ones at parameter boundaries, then strip the sentinel
    val qClean = regexp_replace(
      regexp_replace(concat(lit("&"), query),
        "&(utm_[A-Za-z]+|gclid|fbclid|msclkid|ref|ref_src)=[^&]*", ""),
      "^&", "")
    val cleanRest = concat(
      when(path === "/" && qClean === "", lit("")).otherwise(path),
      when(qClean === "", lit("")).otherwise(concat(lit("?"), qClean)))
    when(scheme === "" || h === "", url) // not an absolute URL: pass through
      .otherwise(concat(scheme, lit("://"), h, keptPort, cleanRest))
  }

  /** Keep only documents whose registrable domain is NOT in `blocklist`
    * (one `domain` string column). Broadcast anti join: the blocklist
    * never shuffles the corpus.
    */
  def filterBlocked(docs: DataFrame, urlCol: String,
                    blocklist: DataFrame): DataFrame = {
    val dom = registeredDomain(col(urlCol)).as("__dom")
    docs.withColumn("__dom", dom)
      .join(broadcast(blocklist.toDF("__dom").distinct()),
        Seq("__dom"), "left_anti")
      .drop("__dom")
  }

  /** URL-keyed dedup: one survivor per [[normalize]]d URL, preferring the
    * highest `preference` value (quality score, fetch recency, …) with
    * `idCol` as the deterministic tie-break (smallest id wins).
    *
    * Shape: one shuffle keyed on the canonical URL carrying only
    * (url, preference, id); survivors semi-join back by id — document
    * bodies never shuffle (the [[Dedup.canonicalize]] pattern).
    */
  def dedupByUrl(docs: DataFrame, urlCol: String, idCol: String,
                 preference: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = docs.select(col(idCol), normalize(col(urlCol)).as("__canon"),
      preference.as("__pref"))
    val w = Window.partitionBy(col("__canon"))
      .orderBy(col("__pref").desc, col(idCol).asc)
    val survivors = keyed
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select(col(idCol))
    docs.join(survivors, Seq(idCol), "left_semi")
  }
}
