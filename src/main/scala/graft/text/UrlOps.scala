package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL/domain metadata operators (beyond reference, a14): the FIRST
  * stage of every web-crawl curation pipeline — C4/RefinedWeb drop
  * ~30% of documents on URL rules alone before any text is read.
  * Host extraction, per-domain rollup, blocklist gating, and
  * domain-keyed mixture (the a08 cut re-keyed on the registrable
  * domain).
  *
  * Everything here is a pure column expression over ONE regex whose
  * syntax is RE2-compatible (no backreferences, no lookaround), so the
  * DuckDB oracle replays host extraction with the same pattern —
  * `parse_url` semantics without engine-specific URI parsers.
  *
  * Scale shape: extraction is map-side; the rollup is one
  * domain-keyed agg (map-side combinable); the gate is a literal
  * suffix-match filter (the blocklist is driver-side small by
  * contract — production lists are 10⁴–10⁶ entries, still a broadcast
  * at worst); the mixture is [[graft.core.ScaleOps.mixtureSample]]
  * unchanged. No join anywhere except what the mixture already does.
  */
object UrlOps {

  /** Host part of a URL: scheme `://`, optional `userinfo@`, host up
    * to the first `:port`, `/path`, `?query` or `#fragment`.
    * RE2-compatible and case-normalized; no match → null. */
  val HostPattern = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"

  def host(url: Column): Column = {
    val h = lower(regexp_extract(url, HostPattern, 1))
    when(h === "", lit(null).cast("string")).otherwise(h)
  }

  /** Registrable domain ≈ the last two dot-labels of the host
    * (`a.b.site.com` → `site.com`); single-label hosts are their own
    * domain. A hermetic engine carries no public-suffix list — for
    * `co.uk`-style suffixes callers supply their own mapping upstream;
    * the two-label rule is the standard PSL-free approximation. */
  val DomainPattern = "([^.]+\\.[^.]+)$"

  def domain(url: Column): Column = {
    val h = host(url)
    val d = regexp_extract(h, DomainPattern, 1)
    when(h.isNull, lit(null).cast("string"))
      .otherwise(when(d === "", h).otherwise(d))
  }

  /** Per-domain doc/token/char rollup with a blocklist flag: the
    * domain-level data card (and the frame a blocklist gets tuned on).
    * Docs whose URL yields no host land under domain null. */
  /** URL canonicalization (a16) — the normalize-before-dedup step of
    * crawl pipelines (two fetches of one page under tracking-param /
    * case / default-port variants must collapse to ONE canonical key
    * before URL-keyed dedup). Deterministic rule chain, every regex
    * RE2-compatible so the oracle replays it verbatim:
    *   1. un-parseable URLs (no `scheme://`) pass through UNCHANGED;
    *   2. scheme and host lowercase; `userinfo@` stripped;
    *   3. default ports dropped (http:80, https:443); others kept;
    *   4. fragment dropped;
    *   5. tracking parameters dropped (`utm_*`, `gclid`, `fbclid`,
    *      `ref`), with the query separator repaired when the first
    *      parameter was the tracked one;
    *   6. a dangling `?`/`&` and a bare root `/` dropped.
    * Non-root trailing slashes and path case are PRESERVED — path
    * semantics belong to the origin server, only scheme/host/port are
    * case-insensitive by RFC 3986. Pure map-side expression chain. */
  def urlNormalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hst = host(url)
    val port = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+)", 1)
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val tail0 = regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#]+(.*)$", 1)
    val t1 = regexp_replace(tail0, "#.*$", "")
    val t2 = regexp_replace(t1,
      "[?&](utm_[a-zA-Z0-9]+|gclid|fbclid|ref)=[^&]*", "")
    val t3 = regexp_replace(t2, "^([^?&]*)&", "$1?")
    val t4 = regexp_replace(t3, "[?&]$", "")
    val tail = when(t4 === "/", lit("")).otherwise(t4)
    when(hst.isNull, url).otherwise(concat(scheme, lit("://"), hst,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")), tail))
  }

  def domainRollup(df: DataFrame, id: String, url: String, text: String,
                   blocklist: Seq[String] = Nil): DataFrame =
    df.select(domain(col(url)).as("domain"),
        size(filter(split(col(text), " "), t => t =!= ""))
          .cast("long").as("_nt"),
        length(col(text)).cast("long").as("_nc"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"),
        sum(col("_nc")).as("n_chars"))
      .withColumn("blocked", blockedFlag(col("domain"), blocklist))

  /** 1 iff the domain is on the blocklist: exact match, or a
    * subdomain of a blocked entry (host-suffix rule — blocking
    * `site.com` blocks `a.site.com`). Null domains are never
    * "blocked" — route them to a null-URL gate if the pipeline wants
    * them gone. */
  def blockedFlag(domainCol: Column, blocklist: Seq[String]): Column =
    if (blocklist.isEmpty) lit(0)
    else blocklist.map(b => (domainCol === lit(b.toLowerCase)) ||
        domainCol.endsWith("." + b.toLowerCase))
      .reduce(_ || _).cast("int")

  /** Drop documents whose URL's HOST is blocklisted (subdomains
    * included): the match runs on the full host, so a blocklist can
    * carry entries at any depth — `example.com` blocks
    * `ads.example.com`, and `ads.example.com` blocks only that branch.
    * Docs with un-parseable URLs are KEPT — they carry no domain
    * evidence either way. */
  def domainGate(df: DataFrame, url: String,
                 blocklist: Seq[String]): DataFrame =
    df.filter(coalesce(blockedFlag(host(col(url)), blocklist), lit(0)) === 0)

  /** Domain-keyed mixture rebalancing: [[graft.core.ScaleOps
    * .mixtureSample]] with the registrable domain as the mixture key —
    * "cap Wikipedia at 5%, boost curated sources" at crawl scale. */
  def domainMixture(df: DataFrame, id: String, url: String, salt: Int,
                    target: Map[String, Double]): DataFrame =
    graft.core.ScaleOps.mixtureSample(
      df.withColumn("_domain", domain(col(url))), id, "_domain",
      salt, target)
}
