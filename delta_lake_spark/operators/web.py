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
registered-domain column is the last-two-labels heuristic — a full
public-suffix-list lookup is a broadcast join against that list's
~9k rows, noted rather than shipped since the list itself is data,
not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TRACKING_KEYS = ("fbclid", "gclid", "ref")


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
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Canonicalize a URL column (module rules above). Map-only, zero
    Python. Returns (id_col, url_col, url_norm, host,
    registered_domain, url_hash) — url_hash is xxhash64 of the
    canonical form, the key URL-level dedup buckets on."""
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
    return out.select(
        id_col,
        url_col,
        "url_norm",
        "host",
        F.expr(
            "CASE WHEN size(split(host, '\\\\.')) >= 2"
            " THEN concat_ws('.', slice(split(host, '\\\\.'),"
            "      size(split(host, '\\\\.')) - 1, 2))"
            " ELSE host END"
        ).alias("registered_domain"),
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


def html_extract_text(df: DataFrame, html_col: str, id_col: str) -> DataFrame:
    """HTML -> text extraction (the step between container walk and
    text processing in a web pipeline), as a fixed chain of
    regexp_replace passes both engines define identically:

    1. drop ``<script>``/``<style>`` elements WITH their content
       (non-greedy, dot-matches-newline, case-insensitive tags);
    2. drop ``<!-- comments -->``;
    3. strip every remaining tag;
    4. decode the five basic entities (&amp; &lt; &gt; &quot; &#39;)
       — &amp; LAST, so ``&amp;lt;`` decodes to the literal ``&lt;``
       the author wrote, not a spurious ``<``;
    5. collapse whitespace runs to single spaces and trim.

    Map-only, zero Python, zero shuffles. This is the deterministic
    80%-case extractor (the trafilatura/jusText class of
    readability heuristics is a model-weighted layer ON TOP of this,
    not a replacement for it). Returns (id_col, text, n_chars).
    """
    steps = [
        (r"(?is)<script\b[^>]*>.*?</script>", " "),
        (r"(?is)<style\b[^>]*>.*?</style>", " "),
        (r"(?s)<!--.*?-->", " "),
        (r"<[^>]*>", " "),
        (r"&lt;", "<"),
        (r"&gt;", ">"),
        (r"&quot;", "\""),
        (r"&#39;", "'"),
        (r"&amp;", "&"),
        (r"\s+", " "),
    ]
    col = F.col(html_col)
    for pat, rep in steps:
        col = F.regexp_replace(col, pat, rep)
    return df.select(
        F.col(id_col),
        F.trim(col).alias("text"),
    ).withColumn("n_chars", F.length("text").cast("long"))
