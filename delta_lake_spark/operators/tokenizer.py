"""BPE tokenizer training and encoding over a document corpus.

The missing member of the tokenizer tool-chain (bigram mining lives in
``text.bigram_counts``): learn the top-N byte-pair-encoding merges from
the corpus word histogram (Sennrich et al. 2016 — BPE trains on DISTINCT
words weighted by frequency, never on raw running text), then encode
documents with the learned merge table.

Scale shape (the 100-TB contract):
  - ONE corpus-wide shuffle total: the word histogram. Everything
    iterative happens on the vocabulary relation (distinct words —
    millions of rows at web scale, not billions). When that histogram
    fits the documented driver bound, ``strategy="auto"`` collects it
    and runs the classic greedy loop driver-side (one Spark job
    total); above the bound the rounds run distributed on the
    persisted vocabulary relation.
  - Each merge round is: a vocab-sized pair aggregation, a single-ROW
    argmax collect (bounded by contract — one (a, b, weight) row per
    round), and a map-only higher-order-function rewrite of the symbol
    arrays. No Python UDFs anywhere; the merge rewrite is a codegen'd
    SQL expression.
  - Encoding is map-only: the learned merge table (n_merges rows —
    model-sized, same contract as a broadcast codebook) unrolls into
    one projection per merge, each a shallow HOF rewrite of the
    per-word symbol arrays; zero shuffles, zero Python.

Determinism contract (what makes the DuckDB oracle value-exact):
  - candidate pairs are restricted to a != b. With distinct symbols,
    adjacent matches can never overlap, so "replace all matches" is
    well-defined and order-independent — the greedy left-to-right scan
    of classic BPE and a relational replace-all agree exactly. (Classic
    BPE's identical-pair merges are order-dependent inside runs like
    "aaa"; real tokenizers hit them rarely and late.)
  - argmax ties break lexicographically on (left, right).
  - symbols are characters of the lowercased, whitespace-split words;
    no end-of-word marker (word-internal merges only).

For production merge counts (32k+), drive this loop from a batch-greedy
variant (take the top-k non-conflicting pairs per round) to cut round
count; the per-round dataflow is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MERGE_SCHEMA = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("lhs", StringType(), False),
        StructField("rhs", StringType(), False),
        StructField("merged", StringType(), False),
        StructField("weight", LongType(), False),
    ]
)


def _esc(sym: str) -> str:
    return sym.replace("\\", "\\\\").replace("'", "\\'")


def _chars_expr(word: str) -> str:
    """SQL expression splitting a (bound lambda variable) word into its
    character array."""
    return f"transform(sequence(1, length({word})), i -> substring({word}, i, 1))"


def _words_expr(text_col: str) -> str:
    """Lowercased whitespace tokenization, empties dropped — matches the
    corpus tokenization used across text.py oracles."""
    return (
        f"filter(split(lower(trim({text_col})), '\\\\s+'), x -> x != '')"
    )


def _rewrite_body(s: str, lhs: str, rhs: str) -> str:
    """Rewrite body over a symbol-array term ``s`` (a column name or an
    in-scope lambda variable — referenced several times, so it must be
    cheap): replace every adjacent (lhs, rhs) pair with the
    concatenated symbol. The match-position array is let-bound through
    a single-element-array transform so it is computed once."""
    a, b = _esc(lhs), _esc(rhs)
    merged = _esc(lhs + rhs)
    return f"""element_at(transform(array(
      filter(sequence(1, greatest(size({s}) - 1, 1)),
             i -> i + 1 <= size({s})
                  AND element_at({s}, i) = '{a}'
                  AND element_at({s}, i + 1) = '{b}')
    ), p ->
    transform(
      filter(sequence(1, size({s})), i -> NOT array_contains(p, i - 1)),
      i -> IF(array_contains(p, i), '{merged}', element_at({s}, i))
    )
  ), 1)"""


def apply_merge_expr(s_expr: str, lhs: str, rhs: str) -> str:
    """SQL expression rewriting symbol array ``s_expr`` by replacing
    every adjacent (lhs, rhs) pair with the concatenated symbol.

    ``s_expr`` is textually referenced ONCE: it is let-bound through a
    single-element-array transform (``transform(array(e), s -> ...)``),
    so textual chaining grows linearly. NOTE: the analyzer's resolution
    fixed point still scales with LAMBDA NESTING depth — chain at most
    a handful of layers inside one expression; for long merge chains
    use the one-projection-per-merge shape of :func:`bpe_encode`.
    Requires lhs != rhs (matches cannot overlap, replace-all is
    well-defined); ``train_bpe_merges`` only emits such pairs."""
    if lhs == rhs:
        raise ValueError("apply_merge_expr requires lhs != rhs")
    return (
        f"element_at(transform(array({s_expr}), s ->\n"
        + _rewrite_body("s", lhs, rhs)
        + "\n), 1)"
    )


def _train_driver(hist: list, n_merges: int) -> list:
    """Classic greedy BPE over a collected word histogram — the
    small-vocabulary fast path. Identical semantics to the distributed
    rounds: a != b candidates only (so greedy replace-all is
    order-independent), argmax ties by lexicographic (lhs, rhs)."""
    vocab = [(tuple(w), int(c)) for w, c in hist]
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for s, c in vocab:
            for i in range(len(s) - 1):
                if s[i] != s[i + 1]:
                    p = (s[i], s[i + 1])
                    counts[p] = counts.get(p, 0) + c
        if not counts:
            break
        (a, b), wgt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, wgt))
        ab = a + b
        nxt = []
        for s, c in vocab:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            nxt.append((tuple(out), c))
        vocab = nxt
    return merges


def train_bpe_merges(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 8,
    strategy: str = "auto",
    driver_max_vocab: int = 100_000,
) -> DataFrame:
    """Learn the top-``n_merges`` BPE merges from the corpus.

    Returns an ``n_merges``-row DataFrame (rank, lhs, rhs, merged,
    weight) — weight is the frequency-weighted count of adjacent
    occurrences the pair had when it was chosen. Stops early if no
    two-distinct-symbol pair remains.

    Strategy (same auto convention as the dedup operators): the merge
    loop only ever touches the DISTINCT-WORD histogram, so when that
    vocabulary fits the ``driver_max_vocab`` contract (default 100k
    rows — natural-language corpora at any size rarely exceed a few
    million) ``auto`` collects it in ONE corpus scan and runs the
    classic greedy loop driver-side: one Spark job total instead of
    two per merge round. Above the bound — or with
    ``strategy="distributed"`` — each round runs on the persisted
    vocabulary relation and collects exactly one row (the argmax)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if strategy not in ("auto", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(F.expr(_words_expr(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    if strategy == "auto":
        # bounded probe-and-collect: one scan; the +1 row detects
        # overflow without a separate count job
        hist = [
            (r.w, r.cnt) for r in words.limit(driver_max_vocab + 1).collect()
        ]
        if len(hist) <= driver_max_vocab:
            return spark.createDataFrame(
                _train_driver(hist, n_merges), MERGE_SCHEMA
            )
    # eager localCheckpoint, not persist: caching alone keeps the full
    # logical plan, so round r's analysis replays r stacked HOF layers
    # and the DRIVER becomes the bottleneck as rounds accumulate
    # (measured 13 s/round by round 16 on a 14k-word vocab vs ~0.5 s
    # with truncation). Checkpointing each round's vocabulary is the
    # MLlib convention for iterative algorithms; on a real cluster
    # prefer reliable checkpoints if executor loss matters.
    vocab = words.select(
        "cnt", F.expr(_chars_expr("w")).alias("s")
    ).localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (
            vocab.select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform("
                        "  filter(sequence(1, greatest(size(s) - 1, 1)),"
                        "         i -> i + 1 <= size(s)),"
                        "  i -> struct(element_at(s, i) AS a,"
                        "              element_at(s, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .select("cnt", "p.a", "p.b")
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("cnt").alias("weight"))
            .orderBy(F.col("weight").desc(), "a", "b")
            .limit(1)
            .collect()  # bounded: exactly one row per round
        )
        if not best:
            break
        a, b, wgt = best[0].a, best[0].b, int(best[0].weight)
        merges.append((rank, a, b, a + b, wgt))
        if rank == n_merges:
            break  # the last rewrite would never be read
        # eager: materializes AND truncates lineage; the previous
        # round's blocks are released by the context cleaner
        vocab = vocab.select(
            "cnt", F.expr(apply_merge_expr("s", a, b)).alias("s")
        ).localCheckpoint()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def bpe_encode(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    merges,
) -> DataFrame:
    """Encode every document with a learned merge table.

    ``merges`` is the DataFrame from :func:`train_bpe_merges` (collected
    here — model-sized by contract, like a broadcast codebook) or a
    rank-ordered list of (lhs, rhs) pairs. Map-only: one projection per
    merge, each applying a single shallow HOF rewrite layer to the
    per-word symbol arrays (Catalyst collapses the projections; one
    giant nested expression instead would blow the analyzer's
    resolution fixed point at real merge counts). Zero shuffles at any
    corpus size. Returns (id_col, tokens, n_tokens)."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("rank").collect()
        pairs = [(r.lhs, r.rhs) for r in rows]
    else:
        pairs = [(a, b) for a, b in merges]
    out = docs.select(
        F.col(id_col),
        F.expr(
            f"transform({_words_expr(text_col)}, x -> {_chars_expr('x')})"
        ).alias("__sym"),
    )
    for a, b in pairs:
        if a == b:
            raise ValueError("bpe_encode requires lhs != rhs merges")
        out = out.withColumn(
            "__sym",
            F.expr(f"transform(__sym, s -> {_rewrite_body('s', a, b)})"),
        )
    return out.select(
        F.col(id_col),
        F.expr("flatten(__sym)").alias("tokens"),
    ).withColumn("n_tokens", F.size("tokens").cast("long"))
