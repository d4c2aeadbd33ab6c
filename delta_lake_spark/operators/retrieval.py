"""Hybrid retrieval: lexical (BM25) and dense (embedding cosine)
rankings fused with Reciprocal Rank Fusion — the standard production
search composition (RRF: Cormack, Clarke & Buettcher, SIGIR 2009; the
default hybrid mode of mainstream search engines). Pure composition of
existing scale-audited operators plus one rank-arithmetic join, so an
ANSI-SQL oracle replicates it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    query_vec_col: str = "qvec",
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """Top-k documents per query by Reciprocal Rank Fusion of a BM25
    ranking over ``docs`` and an exact cosine ranking over
    ``embeddings`` (keyed by the same document ids):

        rrf(d) = sum over rankings r containing d of 1 / (rrf_k + rank_r(d))

    Fusion consumes RANKS only — both underlying rankings are already
    deterministic (1e-6/tie-broken), so the fused score is a sum of
    exact rationals over small integers and replicates bit-for-bit in
    any engine; final ties break on ascending doc id.

    100 TB design: nothing new — the lexical side is bm25_topk's plan
    (broadcast query terms, postings-only shuffles), the dense side is
    cosine_topk's (broadcast query vectors, scalar top-k shuffle), and
    the fusion is a FULL OUTER join of two k_each-row-per-query
    relations (bounded by |Q| * k_each, broadcastable) followed by one
    top-k window. For corpus-scale serving swap the sides for their
    persistent-index twins (query_text_index / query_pq_index) — the
    fusion contract is identical because it only reads ranks.

    Returns: query_id_col, id_col, rank (1..k), rrf_score (double,
    1e-9-rounded), lex_rank, dense_rank (ints, NULL when the side did
    not retrieve the doc).
    """
    from .similarity import cosine_topk
    from .text import bm25_topk

    lex = bm25_topk(
        docs,
        queries,
        text_col,
        id_col,
        k=k_each,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.col("rank").alias("lex_rank"),
    )
    dense = cosine_topk(
        embeddings,
        queries.select(
            F.col(query_id_col), F.col(query_vec_col).alias(vec_col)
        ),
        k=k_each,
        id_col=vec_id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        exclude_self=False,
    ).select(
        F.col("query_id").alias(query_id_col),
        F.col("neighbor_id").alias(id_col),
        F.col("rank").alias("dense_rank"),
    )
    return _rrf_fuse(lex, dense, query_id_col, id_col, k, rrf_k)


def _rrf_fuse(
    lex: DataFrame,
    dense: DataFrame,
    query_id_col: str,
    id_col: str,
    k: int,
    rrf_k: int,
) -> DataFrame:
    """Fuse a (query, doc, lex_rank) and a (query, doc, dense_rank)
    relation by RRF — shared by the ad-hoc and the served-from-indexes
    hybrids so the fusion arithmetic can never drift."""
    fused = lex.join(dense, [query_id_col, id_col], "full_outer")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0)
        ),
        9,
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.select(
            query_id_col,
            id_col,
            rrf.alias("rrf_score"),
            "lex_rank",
            "dense_rank",
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col, id_col, "rank", "rrf_score", "lex_rank", "dense_rank"
        )
    )


def hybrid_search_rrf_from_indexes(
    queries: DataFrame,
    text_index_path: str,
    pq_index_path: str,
    vectors: DataFrame,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    query_vec_col: str = "qvec",
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    nprobe: int = 4,
) -> DataFrame:
    """The corpus-scale serving twin of ``hybrid_search_rrf``: the
    lexical side reads the persistent inverted index (stored postings,
    never the text) and the dense side reads the persistent IVFPQ index
    (stored m-byte codes, float vectors only for the rerank shortlist).
    The fusion is the SAME rank arithmetic (``_rrf_fuse``), so at any
    scale the hybrid contract is unchanged — only where the rankings
    come from differs. The dense side is ANN (probed cells), so it is
    the production approximation of the exact hybrid, deterministic for
    a given index state.

    Returns: query_id_col, id_col, rank, rrf_score, lex_rank,
    dense_rank."""
    from .similarity import query_pq_index
    from .text import query_text_index

    lex = query_text_index(
        queries,
        text_index_path,
        k=k_each,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
    ).select(
        F.col(query_id_col),
        F.col(id_col),
        F.col("rank").alias("lex_rank"),
    )
    dense = query_pq_index(
        queries.select(
            F.col(query_id_col).alias(vec_id_col),
            F.col(query_vec_col).alias(vec_col),
        ),
        vectors,
        pq_index_path,
        k=k_each,
        nprobe=nprobe,
        id_col=vec_id_col,
        vec_col=vec_col,
    ).select(
        F.col("query_id").alias(query_id_col),
        F.col("neighbor_id").alias(id_col),
        F.col("rank").alias("dense_rank"),
    )
    return _rrf_fuse(lex, dense, query_id_col, id_col, k, rrf_k)


def phrase_search(
    df: DataFrame,
    text_col: str,
    id_col: str,
    phrase: str,
) -> DataFrame:
    """Exact-phrase search over positional postings — the classic
    positional-inverted-index algorithm (Manning, Raghavan & Schütze,
    IIR §2.4.2), shaped so the join count does NOT grow with phrase
    length: explode the corpus into (doc, pos, term) postings, keep
    only postings whose term occurs in the phrase (the pushed-down
    scan prune; against a persistent term-partitioned index this is
    partition pruning), broadcast-join the tiny (term, offset)
    relation (a term repeated in the phrase yields one row per
    offset), compute anchor = pos - offset, and count matched offsets
    per (doc, anchor): a full-length count is an occurrence starting
    at that anchor. The only corpus-sized exchange is that
    (doc, anchor) count — for ANY phrase length (no L-way self-join
    chain); the per-doc rollup re-exchanges occurrence rows only. No
    Python anywhere.

    Returns: id_col, n_occurrences (long), first_pos (long, 1-based),
    sorted by id.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("phrase must contain at least one term")
    length = len(terms)
    spark = df.sparkSession
    offsets = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "term string, offset int"
    )
    postings = (
        df.select(
            F.col(id_col),
            F.posexplode(
                F.expr(
                    f"filter(split(lower(trim({text_col})), '\\\\s+'),"
                    " x -> x != '')"
                )
            ).alias("__p", "term"),
        )
        .filter(F.col("term").isin(list(set(terms))))
        .select(F.col(id_col), (F.col("__p") + 1).alias("pos"), "term")
    )
    anchored = (
        postings.join(F.broadcast(offsets), "term")
        .select(F.col(id_col), (F.col("pos") - F.col("offset")).alias("anchor"))
        .filter(F.col("anchor") >= 1)
    )
    occurrences = (
        anchored.groupBy(id_col, "anchor")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") == length)
    )
    return (
        occurrences.groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("anchor").cast("long").alias("first_pos"),
        )
        .orderBy(id_col)
    )


def retrieval_eval(
    ranked: DataFrame,
    rel: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Integer-exact ranking-quality metrics per query: precision@k,
    recall, and MRR over a ranked result relation (``ranked``:
    query/doc/rank) against a relevance relation (``rel``: query/doc)
    — the eval sheet a retrieval pipeline reads beside the index
    itself. All ratios are MICRO-integers (1e6-scaled integral div),
    so every cell is exact and engine-portable: float means of
    reciprocal ranks are summation-order-dependent and cannot be
    oracle-pinned, 1000000 div rank can.

    Scale shape: one rank-filter projection, one |results|-sized left
    join onto rel, two group aggregations joined FULL OUTER on the
    query id — so the output covers the whole query universe
    (ranked-at-k ∪ rel): a query with relevant docs but ZERO retrieved
    rows reports hits=0 / recall_micro=0 explicitly instead of
    vanishing from the sheet. Everything keyed on the query id; no
    window.

    Returns (query_col, n_rel, hits, p_at_k_micro, recall_micro,
    mrr_micro); recall/MRR are NULL for queries with no relevant doc
    / no relevant doc retrieved.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    top = ranked.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(rank_col).alias("__r"),
    )
    r = rel.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.lit(1).alias("__rel"),
    ).distinct()
    relc = r.groupBy("__q").agg(F.count("*").cast("long").alias("n_rel"))
    hits = (
        top.join(r, ["__q", "__d"], "left")
        .groupBy("__q")
        .agg(
            F.sum(F.coalesce(F.col("__rel"), F.lit(0)))
            .cast("long")
            .alias("hits"),
            F.min(F.when(F.col("__rel").isNotNull(), F.col("__r")))
            .cast("long")
            .alias("__first"),
        )
    )
    # FULL OUTER: a query present in rel but absent from the top-k
    # (nothing retrieved) must still report a zero row, not vanish.
    out = hits.join(relc, "__q", "full").withColumn(
        "hits", F.coalesce(F.col("hits"), F.lit(0)).cast("long")
    )
    return out.select(
        F.col("__q").alias(query_col),
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        "hits",
        F.expr(f"(1000000 * hits) div {int(k)}").alias("p_at_k_micro"),
        F.expr(
            "CASE WHEN n_rel > 0 THEN (1000000 * hits) div n_rel END"
        ).alias("recall_micro"),
        F.expr(
            "CASE WHEN __first IS NOT NULL THEN 1000000 div __first END"
        ).alias("mrr_micro"),
    )
