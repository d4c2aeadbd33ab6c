"""Web-corpus URL operators: normalization and URL-level dedup.

URL-level dedup is the FIRST dedup tier of every web-scale pipeline
(before any text is even fetched/parsed, the frontier and the corpus
are deduplicated on canonical URLs), and tracking-parameter stripping
plus case/port/slash canonicalization is what makes it effective —
the same page arrives as ``HTTP://Site.COM:80/a/?utm_source=x&b=2&a=1``
and ``http://site.com/a/?a=1&b=2``.

All pure string expressions (built-in functions, zero Python, zero
shuffles for normalization; dedup is one hash aggregation) and every
rule is stated so an external SQL engine replays it byte-for-byte:

1. trim whitespace; strip the ``#fragment``;
2. lowercase the scheme and the host:port (path/query keep case);
3. drop the scheme's default port (``:80`` http, ``:443`` https);
4. drop query parameters whose key starts with ``utm_`` or is exactly
   ``fbclid``/``gclid``/``ref``; sort surviving parameters
   lexicographically (full ``k=v`` strings) and rejoin with ``&``;
5. strip trailing slashes from the path (``/a/`` == ``/a``; a bare
   host keeps no slash at all).

Contract: absolute ``scheme://`` URLs (the web-crawl case). The
registered-domain column defaults to the last-two-labels heuristic
(the public-suffix list's implicit ``*`` rule); pass a public-suffix
relation (one ``suffix`` string column — the real list is ~9k rows of
DATA the caller ships) and ``with_registered_domain`` /
``normalize_urls(suffixes=...)`` resolve it by LONGEST-match broadcast
joins instead, so ``site.co.uk`` buckets as ``site.co.uk``, not
``co.uk``. A ~30-entry sample fixture ships for tests/demos.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_TRACKING_KEYS = ("fbclid", "gclid", "ref")

# Sample of public-suffix-list entries (publicsuffix.org classes: plain
# TLDs, multi-label country suffixes, private registries). A real
# deployment feeds the full list — it is data, not code.
PUBLIC_SUFFIX_SAMPLE = (
    "com", "org", "net", "io", "edu", "gov", "mil", "int", "info",
    "dev", "app", "test", "example",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "au", "com.au", "net.au", "org.au", "edu.au",
    "jp", "co.jp", "ne.jp", "or.jp",
    "br", "com.br", "net.br",
    "in", "co.in", "nz", "co.nz", "za", "co.za",
    "github.io", "gitlab.io", "blogspot.com", "s3.amazonaws.com",
)


def suffix_relation(spark: SparkSession) -> DataFrame:
    """The sample public-suffix fixture as a relation (suffix string)."""
    return spark.createDataFrame(
        [(s,) for s in PUBLIC_SUFFIX_SAMPLE], "suffix string"
    )


_HEURISTIC_DOMAIN = (
    "CASE WHEN size(split({h}, '\\\\.')) >= 2"
    " THEN concat_ws('.', slice(split({h}, '\\\\.'),"
    "      size(split({h}, '\\\\.')) - 1, 2))"
    " ELSE {h} END"
)


def with_registered_domain(
    df: DataFrame,
    host_col: str = "host",
    suffixes: DataFrame | None = None,
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Add ``registered_domain`` for a host column.

    Without ``suffixes``: the last-two-labels heuristic (the PSL's
    implicit ``*`` rule — correct for plain TLDs, wrong for
    ``site.co.uk``-class hosts).

    With ``suffixes`` (one lowercase ``suffix`` string column):
    public-suffix semantics by LONGEST match — for k =
    ``max_suffix_labels``..1 the host's last-k-label tail is
    left-joined against the k-label suffixes (each side tiny ->
    ``broadcast``; the probe is map-only, NO shuffle on the corpus),
    and the longest matching suffix plus its preceding label is the
    registered domain. A host that IS a public suffix returns itself;
    a host matching no rule falls back to the ``*`` heuristic (the
    PSL's own prevailing rule). 100-TB shape: ``max_suffix_labels``
    bounded broadcast hash joins over a <=9k-row build side, zero
    Python, zero shuffles."""
    h = F.col(host_col)
    heuristic = F.expr(_HEURISTIC_DOMAIN.format(h=host_col))
    if suffixes is None:
        return df.withColumn("registered_domain", heuristic)
    out = df.withColumn(
        "__labels", F.split(h, r"\.")
    ).withColumn("__n", F.size("__labels"))
    regs = []
    for k in range(max_suffix_labels, 0, -1):
        sfx = f"__sfx{k}"
        side = (
            suffixes.select(F.lower("suffix").alias(sfx))
            .where(F.size(F.split(F.col(sfx), r"\.")) == k)
            .distinct()
        )
        cand = F.when(
            F.col("__n") >= k,
            F.concat_ws(
                ".", F.slice("__labels", F.col("__n") - k + 1, k)
            ),
        )
        out = out.join(
            F.broadcast(side), cand == F.col(sfx), "left"
        )
        regs.append(
            F.when(
                F.col(sfx).isNotNull(),
                F.when(
                    F.col("__n") > k,
                    F.concat_ws(
                        ".",
                        F.slice("__labels", F.col("__n") - k, k + 1),
                    ),
                ).otherwise(h),
            )
        )
    out = out.withColumn(
        "registered_domain", F.coalesce(*regs, heuristic)
    )
    return out.drop(
        "__labels", "__n", *[f"__sfx{k}" for k in range(1, max_suffix_labels + 1)]
    )


def _norm_expr(url: str) -> str:
    """SQL expression canonicalizing URL term ``url`` (a column name or
    in-scope lambda variable) per the module rules. Nested
    single-element-array transforms let-bind each stage (defragged
    url, scheme/rest, hostport, host/tail, surviving params) so every
    piece is computed once."""
    keys = ", ".join(f"'{k}'" for k in _TRACKING_KEYS)
    params = f"""array_sort(filter(
        split(CASE WHEN instr(t.tail, '?') > 0
              THEN substring(t.tail, instr(t.tail, '?') + 1)
              ELSE '' END, '&'),
        p -> p != ''
             AND NOT startswith(split(p, '=')[0], 'utm_')
             AND NOT split(p, '=')[0] IN ({keys})))"""
    return f"""element_at(transform(array(split(trim({url}), '#')[0]), u ->
  element_at(transform(array(named_struct(
      'scheme', lower(substring_index(u, '://', 1)),
      'rest', substring(u, length(substring_index(u, '://', 1)) + 4))), s ->
    element_at(transform(array(named_struct(
        'scheme', s.scheme,
        'hp', lower(substring_index(substring_index(s.rest, '/', 1),
                                    '?', 1)),
        'tail', substring(s.rest, length(substring_index(
                substring_index(s.rest, '/', 1), '?', 1)) + 1))), h ->
      element_at(transform(array(named_struct(
          'scheme', h.scheme,
          'host', CASE
            WHEN h.scheme = 'http' AND endswith(h.hp, ':80')
              THEN substring(h.hp, 1, length(h.hp) - 3)
            WHEN h.scheme = 'https' AND endswith(h.hp, ':443')
              THEN substring(h.hp, 1, length(h.hp) - 4)
            ELSE h.hp END,
          'tail', h.tail)), t ->
        element_at(transform(array(array_join({params}, '&')), q ->
          t.scheme || '://' || t.host
          || regexp_replace(substring_index(t.tail, '?', 1), '/+$', '')
          || IF(q = '', '', '?' || q)), 1)), 1)), 1)), 1)), 1)"""


def normalize_urls(
    df: DataFrame,
    url_col: str,
    id_col: str,
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """Canonicalize a URL column (module rules above). Map-only, zero
    Python. Returns (id_col, url_col, url_norm, host,
    registered_domain, url_hash) — url_hash is xxhash64 of the
    canonical form, the key URL-level dedup buckets on.
    ``registered_domain`` uses the last-two-labels heuristic unless a
    public-suffix relation is passed (see with_registered_domain)."""
    out = df.select(
        F.col(id_col),
        F.col(url_col),
        F.expr(_norm_expr(url_col)).alias("url_norm"),
    ).withColumn(
        # after the FIRST '://' (a query value may embed another
        # absolute URL — substring_index(…, -1) would grab ITS host),
        # then up to the first '/' and the first '?'
        "host",
        F.expr(
            "substring_index(substring_index("
            "  substring(url_norm, instr(url_norm, '://') + 3),"
            "  '/', 1), '?', 1)"
        ),
    )
    out = with_registered_domain(out, "host", suffixes)
    return out.select(
        id_col,
        url_col,
        "url_norm",
        "host",
        "registered_domain",
        F.xxhash64("url_norm").alias("url_hash"),
    )


def url_dedup(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """URL-level dedup verdicts: normalize, then keep the MIN-id row
    per canonical URL. One hash aggregation on the canonical form —
    the frontier/corpus dedup every crawl pipeline runs first.
    Returns (id_col, url_norm, kept boolean)."""
    normed = normalize_urls(df, url_col, id_col)
    keepers = normed.groupBy("url_norm").agg(
        F.min(id_col).alias("__keep_id")
    )
    return (
        normed.join(keepers, "url_norm")
        .select(
            id_col,
            "url_norm",
            (F.col(id_col) == F.col("__keep_id")).alias("kept"),
        )
    )


def extract_outlinks(
    df: DataFrame,
    html_col: str,
    id_col: str,
    base_url_col: str | None = None,
) -> DataFrame:
    """Extract anchor hrefs from HTML and resolve them to absolute
    URLs — the edge-extraction step of the web link graph (PageRank
    seeds, spam-domain propagation, crawl frontier expansion).

    Extraction order is stated so both engines agree byte for byte:
    all DOUBLE-quoted ``href="..."`` values in document order, then
    all single-quoted ones (two regexp_extract_all passes,
    concatenated; ``link_idx`` numbers the concatenation). Resolution
    against ``base_url_col`` (when given):

    - ``http://``/``https://`` hrefs pass through;
    - protocol-relative ``//host/..`` takes the base's scheme;
    - root-relative ``/path`` takes the base's ``scheme://host``;
    - anything else (path-relative, mailto:, javascript:, bare
      ``#fragment``) resolves to NULL — path-relative resolution
      needs RFC 3986 dot-segment math, out of the deterministic-core
      contract and stated as such.

    Map-only, zero Python, zero shuffles. Returns (id_col, link_idx,
    href, url)."""
    dq = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r"(?is)<a\b[^>]*?\bhref\s*=\s*\"([^\"]*)\""),
        1,
    )
    sq = F.regexp_extract_all(
        F.col(html_col),
        F.lit(r"(?is)<a\b[^>]*?\bhref\s*=\s*'([^']*)'"),
        1,
    )
    cols = [F.col(id_col)]
    if base_url_col is not None:
        cols.append(F.col(base_url_col))
    links = df.select(
        *cols, F.posexplode(F.concat(dq, sq)).alias("link_idx", "href")
    ).withColumn("href", F.trim("href"))
    absolute = F.col("href").startswith("http://") | F.col(
        "href"
    ).startswith("https://")
    if base_url_col is None:
        url = F.when(absolute, F.col("href"))
    else:
        scheme = F.expr(f"substring_index({base_url_col}, '://', 1)")
        host = F.expr(
            f"substring_index(substring_index("
            f"  substring({base_url_col},"
            f"            instr({base_url_col}, '://') + 3),"
            f"  '/', 1), '?', 1)"
        )
        url = (
            F.when(absolute, F.col("href"))
            .when(
                F.col("href").startswith("//"),
                F.concat(scheme, F.lit(":"), F.col("href")),
            )
            .when(
                F.col("href").startswith("/"),
                F.concat(scheme, F.lit("://"), host, F.col("href")),
            )
        )
    return links.select(
        id_col, "link_idx", "href", url.alias("url")
    )


def frontier_plan(
    df: DataFrame,
    url_col: str,
    id_col: str,
    interval_ms: int = 1000,
    suffixes: DataFrame | None = None,
) -> DataFrame:
    """Crawl-frontier politeness schedule: canonicalize the frontier's
    URLs, bucket them by registered domain, and assign each a
    per-domain fetch sequence and millisecond offset so no domain is
    hit more often than once per ``interval_ms`` (the crawl-delay
    contract every polite crawler honors). Ordering within a domain is
    ascending id — deterministic and replayable. One shuffle (the
    per-domain window); at 100 TB the frontier partitions by domain
    hash and each partition's windows are independent. Returns
    (id_col, url_norm, registered_domain, fetch_seq 1-based,
    fetch_offset_ms)."""
    normed = normalize_urls(df, url_col, id_col, suffixes=suffixes)
    w = Window.partitionBy("registered_domain").orderBy(F.col(id_col))
    return normed.select(
        id_col,
        "url_norm",
        "registered_domain",
        F.row_number().over(w).alias("fetch_seq"),
        (
            (F.row_number().over(w) - 1) * F.lit(int(interval_ms))
        ).cast("long").alias("fetch_offset_ms"),
    )


def parse_sitemap(
    df: DataFrame, xml_col: str, id_col: str
) -> DataFrame:
    """Parse sitemap XML (sitemaps.org urlset schema, the crawl
    frontier's seed source) with built-ins only: one
    regexp_extract_all over ``<url>..</url>`` blocks, then per-block
    ``<loc>`` (required; blocks without one are dropped) and optional
    ``<lastmod>``/``<changefreq>``/``<priority>`` extracts —
    regexp_extract returns '' for absent tags, stated back to NULL.
    Map-only, zero Python, zero shuffles. Returns (id_col, entry_idx,
    loc, lastmod, changefreq, priority double)."""
    blocks = df.select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(r"(?is)<url>(.*?)</url>"), 1
            )
        ).alias("entry_idx", "__blk"),
    )

    def tag(name):
        return F.trim(
            F.regexp_extract(
                "__blk", rf"(?is)<{name}>\s*(.*?)\s*</{name}>", 1
            )
        )

    out = blocks.select(
        id_col,
        "entry_idx",
        tag("loc").alias("loc"),
        tag("lastmod").alias("lastmod"),
        tag("changefreq").alias("changefreq"),
        tag("priority").alias("priority"),
    ).filter(F.col("loc") != "")
    return out.select(
        id_col,
        "entry_idx",
        "loc",
        F.when(F.col("lastmod") != "", F.col("lastmod")).alias("lastmod"),
        F.when(F.col("changefreq") != "", F.col("changefreq")).alias(
            "changefreq"
        ),
        F.when(F.col("priority") != "", F.col("priority"))
        .cast("double")
        .alias("priority"),
    )


def parse_robots(
    df: DataFrame, robots_col: str, id_col: str
) -> DataFrame:
    """Parse robots.txt text into a rule relation (RFC 9309 grammar,
    literal-prefix subset): one row per (group, directive) with the
    group's user-agents attached. Grouping is positional — consecutive
    ``User-agent:`` lines open a group, Allow/Disallow lines belong to
    the most recent group; ``#`` comments and empty Disallow values
    (allow-all, rule-free per the RFC) are dropped. ``*``/``$``
    wildcards pass through verbatim (robots_verdicts interprets
    them). All window/aggregate over per-domain line counts — tiny.
    Returns (id_col, group_id, agent array<string>, rule
    'allow'|'disallow', path)."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias(
            "__ln", "__line"
        ),
    ).select(
        id_col,
        "__ln",
        F.trim(F.regexp_replace("__line", "#.*$", "")).alias("__line"),
    )
    parsed = lines.select(
        id_col,
        "__ln",
        F.lower(
            F.trim(F.regexp_extract("__line", r"^([^:]+):", 1))
        ).alias("__field"),
        F.trim(F.regexp_extract("__line", r"^[^:]+:(.*)$", 1)).alias(
            "__value"
        ),
    )
    w = Window.partitionBy(id_col).orderBy("__ln")
    grouped = parsed.withColumn(
        "__is_ua", F.col("__field") == "user-agent"
    ).withColumn(
        "__new",
        (
            F.col("__is_ua")
            & ~F.coalesce(F.lag("__is_ua").over(w), F.lit(False))
        ).cast("int"),
    ).withColumn(
        "group_id",
        F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    agents = (
        grouped.filter(F.col("__is_ua"))
        .groupBy(id_col, "group_id")
        .agg(
            F.array_sort(
                F.collect_set(F.lower("__value"))
            ).alias("agents")
        )
    )
    rules = grouped.filter(
        F.col("__field").isin("allow", "disallow")
        & (F.col("__value") != "")
    ).select(
        id_col,
        "group_id",
        F.col("__field").alias("rule"),
        F.col("__value").alias("path"),
    )
    return rules.join(agents, [id_col, "group_id"]).select(
        id_col, "group_id", "agents", "rule", "path"
    )


def robots_verdicts(
    robots_df: DataFrame,
    robots_col: str,
    urls_df: DataFrame,
    path_col: str,
    id_col: str,
    agent: str,
) -> DataFrame:
    """Evaluate URL paths against per-domain robots.txt rules for one
    crawler token (RFC 9309 evaluation over the parse_robots
    relation): the group with the exact (lowercased) agent match wins;
    domains without one fall back to their ``*`` groups; within the
    chosen groups the LONGEST rule (most pattern octets, the RFC's
    specificity measure) decides, an allow/disallow tie at equal
    length resolving to allow; no matching rule means allowed.
    Patterns support the RFC's ``*`` (any octet sequence) and a
    trailing ``$`` end-anchor — wildcard-free rules keep the plain
    startswith fast path; wildcard rules compile to an anchored regex
    (metacharacters escaped, ``*`` -> ``.*``) evaluated in the join
    condition. One equi-join on the domain id (the match test is a
    post-join condition, never a cartesian) + one per-URL window.
    Returns (id_col, path_col, allowed boolean, matched_rule,
    matched_path — the raw pattern; NULL when no rule matched)."""
    rules = parse_robots(robots_df, robots_col, id_col)
    agent = agent.lower()
    mine = rules.filter(F.array_contains("agents", agent))
    spec_ids = mine.select(id_col).distinct()
    star = rules.filter(F.array_contains("agents", "*")).join(
        spec_ids, id_col, "left_anti"
    )
    scoped = mine.unionByName(star).select(
        F.col(id_col).alias("__rid"),
        F.col("rule").alias("__rrule"),
        F.col("path").alias("__rpath"),
    )
    # wildcard rules -> anchored regex; plain rules keep startswith
    anchored = F.col("__rpath").endswith("$")
    raw = F.when(
        anchored,
        F.expr("substring(__rpath, 1, length(__rpath) - 1)"),
    ).otherwise(F.col("__rpath"))
    esc = F.regexp_replace(
        raw, r"([\\.\^\$\+\?\(\)\{\}\|\[\]])", r"\\$1"
    )
    rx = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    scoped = scoped.withColumn(
        "__wild", F.col("__rpath").contains("*") | anchored
    ).withColumn("__rx", F.when(F.col("__wild"), rx))
    u = urls_df.select(id_col, path_col)
    # LEFT join with the match test IN the condition: a URL whose
    # domain has rules but no matching pattern keeps its NULL row
    matches = u.join(
        scoped,
        (F.col(id_col) == F.col("__rid"))
        & F.when(
            F.col("__wild"), F.expr(f"{path_col} rlike __rx")
        ).otherwise(F.col(path_col).startswith(F.col("__rpath"))),
        "left",
    )
    w = Window.partitionBy(id_col, path_col).orderBy(
        F.length("__rpath").desc_nulls_last(),
        (F.col("__rrule") == "allow").desc(),
    )
    best = matches.withColumn(
        "__rn", F.row_number().over(w)
    ).filter(F.col("__rn") == 1)
    return best.select(
        id_col,
        path_col,
        (
            F.col("__rrule").isNull() | (F.col("__rrule") == "allow")
        ).alias("allowed"),
        F.col("__rrule").alias("matched_rule"),
        F.col("__rpath").alias("matched_path"),
    )


# jusText/Kohlschütter-class boilerplate removal: deterministic
# block-level layer between raw HTML extraction (q275) and document
# quality filters (the Gopher rules, q133). English stopword fixture —
# the rule compares densities, so a ~30-word core list is what the
# published heuristics use.
BOILERPLATE_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "were", "be", "been", "it", "that", "this", "with", "as",
    "for", "on", "at", "by", "from", "not", "have", "has", "had",
    "but", "they", "we", "you", "he", "she",
)

_BLOCK_TAG_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|td|tr|th|table|blockquote|pre|br|"
    r"section|article|header|footer|nav|aside|form)\b[^>]*>"
)
_ANCHOR_CAPTURE = r"(?is)<a\b[^>]*>(.*?)</a>"


def boilerplate_blocks(
    df: DataFrame,
    html_col: str,
    id_col: str,
    min_chars: int = 30,
    max_link_density_pct: int = 34,
    min_stopword_density_pct: int = 15,
    min_words_for_stopword_rule: int = 5,
) -> DataFrame:
    """Block-level boilerplate classification (the jusText /
    Kohlschütter text-density family, stated with INTEGER-exact rules
    so an external SQL engine replays every verdict):

    1. pre-clean: drop script/style elements with content, drop
       comments (the html_extract_text steps 1-3);
    2. split into blocks on block-level tag boundaries (p, div, h1-h6,
       li, td, table parts, br, section/article/header/footer/nav/
       aside/form — the tag itself is the delimiter, discarded);
    3. per block: ``text`` = tag-stripped, five-entity-decoded,
       whitespace-collapsed, trimmed; ``link_chars`` = summed length of
       each ``<a>..</a>`` anchor's tag-stripped collapsed text;
       ``n_words`` / ``stop_words`` over single-space word splits
       (stopwords lowercased, exact-token match);
    4. audit flags, each a stated integer comparison:
       - ``flag_short``: n_chars < min_chars;
       - ``flag_link_heavy``: link_chars * 100 >= n_chars *
         max_link_density_pct;
       - ``flag_low_stopword``: n_words >= min_words_for_stopword_rule
         AND stop_words * 100 < n_words * min_stopword_density_pct;
       - ``is_content``: none of the above.

    Blocks whose text is empty are dropped; ``block_idx`` keeps the
    ORIGINAL split position so the block order (and any later
    re-assembly) is stable. Map-only: one posexplode, zero Python,
    zero shuffles. Returns (id_col, block_idx, text, n_chars, n_words,
    link_chars, stop_words, flag_short, flag_link_heavy,
    flag_low_stopword, is_content)."""
    pre = F.col(html_col)
    for pat in (
        r"(?is)<script\b[^>]*>.*?</script>",
        r"(?is)<style\b[^>]*>.*?</style>",
        r"(?s)<!--.*?-->",
    ):
        pre = F.regexp_replace(pre, pat, " ")
    blocks = df.select(
        F.col(id_col),
        F.posexplode(F.split(pre, _BLOCK_TAG_SPLIT)).alias(
            "block_idx", "__blk"
        ),
    )

    def clean(col):
        steps = [
            (r"<[^>]*>", " "),
            (r"&lt;", "<"),
            (r"&gt;", ">"),
            (r"&quot;", "\""),
            (r"&#39;", "'"),
            (r"&amp;", "&"),
            (r"\s+", " "),
        ]
        for pat, rep in steps:
            col = F.regexp_replace(col, pat, rep)
        return F.trim(col)

    # Anchor text gets the SAME clean chain as block text (tag strip,
    # five-entity decode, whitespace collapse, trim) — measuring link
    # chars on entity-ENCODED anchors ('&amp;' as 5 chars) against an
    # entity-DECODED denominator would inflate link density past 100%
    # on entity-heavy anchors and skew flag_link_heavy.
    link_chars = F.aggregate(
        F.regexp_extract_all(F.col("__blk"), F.lit(_ANCHOR_CAPTURE), 1),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.length(clean(x)),
    )
    scored = blocks.select(
        id_col,
        "block_idx",
        clean(F.col("__blk")).alias("text"),
        link_chars.alias("link_chars"),
    ).filter(F.length("text") > 0)
    scored = scored.select(
        id_col,
        "block_idx",
        "text",
        F.length("text").cast("long").alias("n_chars"),
        F.size(
            F.filter(F.split("text", " "), lambda w: w != "")
        ).cast("long").alias("n_words"),
        "link_chars",
        F.size(
            F.filter(
                F.split(F.lower("text"), " "),
                lambda w: w.isin(*BOILERPLATE_STOPWORDS),
            )
        ).cast("long").alias("stop_words"),
    )
    flag_short = F.col("n_chars") < min_chars
    flag_link = (
        F.col("link_chars") * 100
        >= F.col("n_chars") * max_link_density_pct
    )
    flag_stop = (F.col("n_words") >= min_words_for_stopword_rule) & (
        F.col("stop_words") * 100
        < F.col("n_words") * min_stopword_density_pct
    )
    return scored.select(
        "*",
        flag_short.alias("flag_short"),
        flag_link.alias("flag_link_heavy"),
        flag_stop.alias("flag_low_stopword"),
        (~(flag_short | flag_link | flag_stop)).alias("is_content"),
    )


def boilerplate_clean_docs(
    df: DataFrame,
    html_col: str,
    id_col: str,
    **rule_kwargs,
) -> DataFrame:
    """Document-level composition of ``boilerplate_blocks``: the
    surviving (is_content) blocks re-assembled in block order — the
    relation a funnel feeds to token/quality stages instead of the
    raw q275 extraction. One hash aggregation on the id. Returns
    (id_col, content_text, content_chars, n_blocks,
    n_content_blocks)."""
    blocks = boilerplate_blocks(df, html_col, id_col, **rule_kwargs)
    return blocks.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("is_content"),
                            F.struct("block_idx", "text"),
                        )
                    )
                ),
                lambda s: s.text,
            ),
            " ",
        ).alias("content_text"),
        F.count("*").cast("long").alias("n_blocks"),
        F.sum(F.when(F.col("is_content"), 1).otherwise(0))
        .cast("long")
        .alias("n_content_blocks"),
    ).withColumn(
        "content_chars", F.length("content_text").cast("long")
    )


def _decode_numeric_entities(col):
    """Decode ``&#NNN;`` / ``&#xHH;`` numeric character references in a
    string column with built-ins only: entity payloads are fenced with
    an \\x01 sentinel (regexp capture), the string split on it, and
    every odd-indexed piece converted to its codepoint's character —
    BMP codepoints via a UTF-16BE unhex-decode, supplementary ones via
    the computed surrogate pair. Invalid references (0, > U+10FFFF, or
    a surrogate codepoint) pass through as their literal ``&#..;``
    text. Contract: the input must not contain \\x01 (a control char
    no HTML carries)."""
    marked = F.regexp_replace(
        col, r"&#([xX][0-9a-fA-F]{1,6}|[0-9]{1,7});", "\x01$1\x01"
    )
    parts = F.split(marked, "\x01")

    def dec(p):
        code = F.when(
            F.lower(F.substring(p, 1, 1)) == "x",
            F.conv(F.substring(p, 2, 16), 16, 10).cast("long"),
        ).otherwise(p.cast("long"))
        valid = (
            code.isNotNull()
            & (code >= 1)
            & (code <= 0x10FFFF)
            & ~((code >= 0xD800) & (code <= 0xDFFF))
        )
        bmp = F.decode(F.unhex(F.lpad(F.hex(code), 4, "0")), "UTF-16BE")
        hi = F.lit(0xD800) + F.floor(
            (code - F.lit(0x10000)) / F.lit(1024)
        ).cast("long")
        lo = F.lit(0xDC00) + (code - F.lit(0x10000)) % F.lit(1024)
        supp = F.decode(
            F.unhex(
                F.concat(
                    F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0")
                )
            ),
            "UTF-16BE",
        )
        return (
            F.when(valid & (code < 0x10000), bmp)
            .when(valid, supp)
            .otherwise(F.concat(F.lit("&#"), p, F.lit(";")))
        )

    return F.array_join(
        F.transform(
            parts, lambda p, i: F.when(i % 2 == 1, dec(p)).otherwise(p)
        ),
        "",
    )


def html_extract_text(
    df: DataFrame,
    html_col: str,
    id_col: str,
    decode_numeric_entities: bool = False,
) -> DataFrame:
    """HTML -> text extraction (the step between container walk and
    text processing in a web pipeline), as a fixed chain of
    regexp_replace passes both engines define identically:

    1. drop ``<script>``/``<style>`` elements WITH their content
       (non-greedy, dot-matches-newline, case-insensitive tags);
    2. drop ``<!-- comments -->``;
    3. strip every remaining tag;
    4. with ``decode_numeric_entities``: decode ``&#NNN;``/``&#xHH;``
       references (see _decode_numeric_entities) — BEFORE the named
       entities, so the common double-escape ``&amp;#65;`` stays the
       literal ``&#65;`` the author wrote (corner: a numeric ``&#38;``
       whose output '&' ends up feeding a following named entity, e.g.
       ``&#38;lt;`` -> '<', decodes one level deeper than a spec HTML
       parser — deterministic and identical in both engines);
    5. decode the five basic entities (&amp; &lt; &gt; &quot; &#39;)
       — &amp; LAST, so ``&amp;lt;`` decodes to the literal ``&lt;``
       the author wrote, not a spurious ``<``. Named entities beyond
       these five (``&nbsp;`` etc.) pass through as text — the
       documented 80%-case contract;
    6. collapse whitespace runs to single spaces and trim.

    Map-only, zero Python, zero shuffles. This is the deterministic
    80%-case extractor (the trafilatura/jusText class of
    readability heuristics is a model-weighted layer ON TOP of this,
    not a replacement for it). Returns (id_col, text, n_chars).
    """
    pre = [
        (r"(?is)<script\b[^>]*>.*?</script>", " "),
        (r"(?is)<style\b[^>]*>.*?</style>", " "),
        (r"(?s)<!--.*?-->", " "),
        (r"<[^>]*>", " "),
    ]
    post = [
        (r"&lt;", "<"),
        (r"&gt;", ">"),
        (r"&quot;", "\""),
        (r"&#39;", "'"),
        (r"&amp;", "&"),
        (r"\s+", " "),
    ]
    col = F.col(html_col)
    for pat, rep in pre:
        col = F.regexp_replace(col, pat, rep)
    if decode_numeric_entities:
        col = _decode_numeric_entities(col)
    for pat, rep in post:
        col = F.regexp_replace(col, pat, rep)
    return df.select(
        F.col(id_col),
        F.trim(col).alias("text"),
    ).withColumn("n_chars", F.length("text").cast("long"))
