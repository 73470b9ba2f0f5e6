package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL decomposition for web-corpus curation: scheme / host / path /
  * registered domain as pure row-local Column expressions.
  *
  * The registered domain is THE grouping key of web-scale curation — C4
  * caps documents per domain, RefinedWeb dedups and rates by it, crawl
  * mixtures weight by it — and grouping by raw host instead silently
  * splits `www.x.com` / `cdn.x.com` / `x.com` into separate quota buckets.
  *
  * All patterns are RE2-compatible (no lookaround, no backrefs) so the
  * DuckDB oracle runs the identical regex, and everything is zero-shuffle:
  * the parse is a handful of codegen'd regexp/array expressions per row.
  *
  * Public-suffix handling: a REAL Mozilla PSL has ~9k rules and belongs in
  * a broadcast lookup refreshed out of band; this module embeds the
  * high-traffic two-level suffixes only ([[TwoLevelSuffixes]]) and
  * documents the seam. Unknown multi-level suffixes degrade to the
  * last-two-labels rule — deterministic, and conservative in the safe
  * direction for capping (over-grouping, never under-grouping).
  */
object Web {

  /** URL scheme, lowercased ("" when the value is not an absolute URL). */
  def urlScheme(u: Column): Column =
    lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Hostname, lowercased, with userinfo and port stripped ("" when the
    * value has no authority component). */
  def urlHost(u: Column): Column =
    lower(regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Path component including the leading slash ("" when absent; query and
    * fragment excluded). */
  def urlPath(u: Column): Column =
    regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)

  /** Two-level public suffixes where the registrable name is the THIRD
    * label from the right (PSL subset — see the object scaladoc). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "com.mx", "com.ar", "com.tr", "com.sg",
    "co.za", "co.nz", "org.nz", "net.nz")

  /** Registered (PSL-registrable) domain of a hostname: IPv4 literals and
    * one/two-label hosts pass through; hosts ending in a known two-level
    * suffix keep three labels; everything else keeps two. */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val last2 = concat_ws(".", slice(labels, -2, 2))
    val last3 = concat_ws(".", slice(labels, -3, 3))
    when(host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$"), host)
      .when(size(labels) <= 2, host)
      .when(last2.isin(TwoLevelSuffixes: _*), last3)
      .otherwise(last2)
  }

  /** Query-parameter names stripped by [[normalizeUrl]]: click/campaign
    * trackers that make byte-distinct URLs of the same page. `utm_` is a
    * prefix; the rest match exactly. */
  val TrackingParamRe = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

  /** Canonical URL for crawl dedup — the same page fetched through
    * campaign links, fragments, default ports, userinfo, or re-ordered
    * query strings must normalize to ONE key:
    *
    *   - scheme + host lowercased; userinfo dropped
    *   - default ports dropped (http:80, https:443); others kept
    *   - fragment dropped; trailing path slashes dropped (root becomes "")
    *   - tracking params dropped ([[TrackingParamRe]]); survivors SORTED
    *
    * Pure row-local expression; non-URL values (no scheme) pass through
    * trimmed, so the column is total. Feed the result to
    * [[Dedup.exactDedup]] (or a groupBy) for canonical-URL dedup. */
  def normalizeUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:(\\d+)", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_replace(urlPath(u), "/+$", "")
    // anchored to the pre-fragment region: a '?' INSIDE the fragment
    // (#sec?a=1) is fragment content and must not leak into the key
    val query = regexp_extract(u, "^[^#?]*\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe)))
    val qs = concat_ws("&", params)
    when(scheme === "", trim(u)).otherwise(concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit(""))))
  }

  /** Visible text of an HTML fragment: script/style blocks dropped, tags
    * stripped, the six ubiquitous entities decoded, whitespace collapsed.
    * A text-extraction PRIMITIVE (boilerplate-aware extraction is a model,
    * not a regex — this is the deterministic first pass), RE2-compatible
    * throughout: no backreferences (script/style each get their own
    * pattern), no lookaround, lazy quantifiers only — so the DuckDB oracle
    * runs the identical patterns. Entity order is part of the contract:
    * `&amp;` decodes LAST, so double-encoded entities (`&amp;lt;`) decode
    * exactly one level per pass, the standard single-pass rule. */
  def stripTags(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** (scheme, host, registered_domain, path) attached as columns — the
    * standard prelude to per-domain capping/rating ([[Curation.capPerGroup]]
    * on `registered_domain`). */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    val host = urlHost(col(urlCol))
    df.withColumn("scheme", urlScheme(col(urlCol)))
      .withColumn("host", host)
      .withColumn("registered_domain", registeredDomain(host))
      .withColumn("path", urlPath(col(urlCol)))
  }

  /** Host labels considered for blocklist matching: a blocklist domain
    * deeper than this is unmatchable (real registrable domains run <= ~5
    * labels), and the cap bounds the suffix explode against crafted
    * million-label hosts in attacker-controlled URLs. */
  val MaxBlocklistLabels = 12

  /** Domain-blocklist filtering (UT1-style): drop rows whose URL host IS a
    * blocked domain or sits anywhere UNDER one — `ads.example.com` blocks
    * `ads.example.com`, `x.ads.example.com`, ... but not
    * `notads.example.com`. The standard crawl-curation step run against
    * multi-million-entry category blocklists.
    *
    * Scale shape: hosts repeat massively in a crawl, so matching runs at
    * DISTINCT-HOST grain — distinct hosts explode into their dot-suffixes
    * (bounded by [[MaxBlocklistLabels]]), ONE equi join against the
    * normalized blocklist marks blocked hosts, and the corpus anti-joins
    * that (typically broadcast) host set: document content never shuffles,
    * and there is no LIKE/regex join (a non-equi join is a nested-loop
    * cross product at scale). A blocklist too large to broadcast degrades
    * to the same equi joins co-keyed on suffix/host — still never
    * quadratic. */
  def domainBlocklistFilter(df: DataFrame, urlCol: String,
                            blocklist: DataFrame, domCol: String): DataFrame = {
    val bl = blocklist
      .select(lower(trim(col(domCol))).as("__dom"))
      .filter(col("__dom") =!= "" &&
        size(split(col("__dom"), "\\.")) <= MaxBlocklistLabels)
      .distinct()
    val withHost = df.withColumn("__host", urlHost(col(urlCol)))
    val hosts = withHost.select(col("__host")).filter(col("__host") =!= "")
      .distinct()
    val labels = split(col("__host"), "\\.")
    val probes = hosts.select(col("__host"), explode(transform(
      sequence(lit(1), least(size(labels), lit(MaxBlocklistLabels))),
      i => array_join(slice(labels, -i, i), "."))).as("__dom"))
    val blockedHosts = probes.join(bl, Seq("__dom"))
      .select(col("__host")).distinct()
    withHost.join(blockedHosts, Seq("__host"), "left_anti").drop("__host")
  }

  // ------------------------------------------------- longest-suffix routing
  /** Longest-suffix-match routing: each URL host matches the MOST SPECIFIC
    * rule whose domain it equals or sits under — `cdn.ads.example.com`
    * carrying rules for both `example.com` and `ads.example.com` takes the
    * latter. The semantics of policy/category tables (UT1 categories,
    * routing maps, per-tenant overrides) where a deeper rule refines a
    * broader one; [[domainBlocklistFilter]] is the any-match special case.
    *
    * Same scale shape as the blocklist: DISTINCT hosts explode into their
    * bounded dot-suffixes, ONE equi join against the normalized rule table,
    * and a per-host argmax — max_by on the matched domain's LABEL COUNT
    * (rule domains are distinct, so the argmax is tie-free) — picks the
    * winner; the corpus then joins the (typically broadcast) host→rule map.
    * No LIKE join, no regex join, content never shuffles. Unmatched rows
    * keep NULL rule columns. Returns the input plus
    * (matched_domain, `valueCol`). */
  def longestSuffixMatch(df: DataFrame, urlCol: String, rules: DataFrame,
                         domCol: String, valueCol: String): DataFrame = {
    val rl = rules
      .select(lower(trim(col(domCol))).as("__dom"), col(valueCol))
      .filter(col("__dom") =!= "" &&
        size(split(col("__dom"), "\\.")) <= MaxBlocklistLabels)
    val withHost = df.withColumn("__host", urlHost(col(urlCol)))
    val hosts = withHost.select(col("__host")).filter(col("__host") =!= "")
      .distinct()
    val labels = split(col("__host"), "\\.")
    val probes = hosts.select(col("__host"), explode(transform(
      sequence(lit(1), least(size(labels), lit(MaxBlocklistLabels))),
      i => array_join(slice(labels, -i, i), "."))).as("__dom"))
    val routed = probes.join(rl, Seq("__dom"))
      .groupBy("__host")
      .agg(max_by(struct(col("__dom").as("matched_domain"), col(valueCol)),
        // label count decides; (dom, value) break a duplicate-rule tie
        // deterministically (duplicate domains are a caller bug, but the
        // argmax must not become run-dependent because of one)
        struct(size(split(col("__dom"), "\\.")), col("__dom"), col(valueCol)))
        .as("__r"))
      .select(col("__host"), col("__r.matched_domain").as("matched_domain"),
        col(s"__r.$valueCol").as(valueCol))
    withHost.join(routed, Seq("__host"), "left").drop("__host")
  }

  /** Tracking parameters stripped by [[canonicalizeUrl]]: the regex matches
    * a full `key=value` pair (RE2-safe, shared verbatim with the oracle). */
  val TrackingParamPattern: String = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="

  /** Canonical URL — the dedup key of web-corpus URL normalization:
    * lowercased scheme+host, userinfo dropped, default ports (http:80 /
    * https:443) dropped, empty path → "/", fragment dropped, tracking
    * parameters ([[TrackingParamPattern]]) removed and the survivors
    * SORTED so parameter order never splits a dedup group.
    *
    * Pure codegen'd Column composition (regexp extracts + one
    * filter/sort/join over the split parameter array) — zero shuffle,
    * RE2-compatible, oracle-replayable. Non-URLs canonicalize to
    * "://" + path-ish garbage only if they contained "://"; callers gate on
    * [[urlScheme]] nonempty first (as [[withCanonicalUrl]] does). */
  def canonicalizeUrl(u: Column): Column = {
    val scheme = urlScheme(u)
    val host = urlHost(u)
    val port = regexp_extract(u,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:(\\d+)", 1)
    val path = urlPath(u)
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = filter(split(query, "&"), p =>
      length(p) > 0 && !p.rlike(TrackingParamPattern))
    val qStr = array_join(array_sort(kept), "&")
    val portPart = when(port === "" ||
      (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    concat(scheme, lit("://"), host, portPart,
      when(path === "", lit("/")).otherwise(path),
      when(qStr === "", lit("")).otherwise(concat(lit("?"), qStr)))
  }

  /** `canonical_url` attached for rows that parse as absolute URLs (others
    * get null) — the prelude to exact URL dedup at canonical grain. */
  def withCanonicalUrl(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canonical_url",
      when(urlScheme(col(urlCol)) =!= "", canonicalizeUrl(col(urlCol))))
}
