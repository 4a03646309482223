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

  /** Registrable domain under a CALLER-SUPPLIED public-suffix frame
    * (a14b — closes the two-label rule's `co.uk` collapse): `suffixes`
    * carries one lowercase dot-separated `suffix` column (a PSL
    * excerpt, e.g. "co.uk", "com.au"); a host ending in `.suffix`
    * keeps one extra label (`a.b.site.co.uk` → `site.co.uk`), the
    * LONGEST listed suffix winning, everything else falling back to
    * the two-label rule. A host that IS a listed suffix stays its own
    * key (the PSL says "no registrable domain"; a stable key beats a
    * null for rollups).
    *
    * Scale shape: one BROADCAST equi-join per distinct suffix DEPTH
    * (the full PSL has 2–5 labels → ≤ 4 joins), keyed on the host's
    * last-k-label slice — never a per-row scan of the list, never an
    * expression chain that grows with |list| (a 9k-entry PSL as
    * `when` chains would blow janino's method limit). The depth probe
    * is one tiny agg on the model-sized suffix frame. */
  def withDomainPsl(df: DataFrame, url: String,
                    suffixes: DataFrame,
                    out: String = "domain"): DataFrame = {
    def lastK(c: Column, k: Int): Column =
      regexp_extract(c, s"((?:[^.]+\\.){${k - 1}}[^.]+)$$", 1)
    val sfx = suffixes.select(lower(col("suffix")).as("suffix"))
      .distinct()
    val ks = sfx.select(size(split(col("suffix"), "\\.")).as("k"))
      .distinct().collect().map(_.getInt(0)).sorted.reverse.toSeq
    val withH = df.withColumn("_h", host(col(url)))
    val joined = ks.foldLeft(withH) { (cur, k) =>
      val s = broadcast(sfx
        .filter(size(split(col("suffix"), "\\.")) === k)
        .select(col("suffix").as(s"_sfx$k")))
      cur.join(s, lastK(col("_h"), k) === col(s"_sfx$k"), "left")
    }
    val cands = ks.map { k =>
      when(col(s"_sfx$k").isNotNull,
        when(lastK(col("_h"), k + 1) =!= "", lastK(col("_h"), k + 1))
          .otherwise(col("_h")))
    }
    val twoLabel = {
      val d = regexp_extract(col("_h"), DomainPattern, 1)
      when(col("_h").isNotNull, when(d === "", col("_h")).otherwise(d))
    }
    joined.withColumn(out, coalesce(cands :+ twoLabel: _*))
      .drop("_h" +: ks.map(k => s"_sfx$k"): _*)
  }

  /** [[domainRollup]] keyed by the PSL-aware registrable domain. */
  def domainRollupPsl(df: DataFrame, id: String, url: String,
                      text: String, suffixes: DataFrame,
                      blocklist: Seq[String] = Nil): DataFrame =
    withDomainPsl(df, url, suffixes)
      .select(col("domain"),
        size(filter(split(col(text), " "), t => t =!= ""))
          .cast("long").as("_nt"),
        length(col(text)).cast("long").as("_nc"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_nt")).as("n_tokens"),
        sum(col("_nc")).as("n_chars"))
      .withColumn("blocked", blockedFlag(col("domain"), blocklist))

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
