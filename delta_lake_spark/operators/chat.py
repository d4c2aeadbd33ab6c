"""SFT / post-training conversation-data operators.

Pretraining curation (the dedup/quality/tokenizer families) stops at
documents; fine-tuning corpora arrive as CONVERSATIONS — JSON arrays
of ``{role, content}`` messages — and preference datasets as
(prompt, chosen, rejected) triples. The audits every post-training
pipeline runs before touching a trainer are structural and
relational: role alternation, turn balance, length bias, degenerate
pairs. All built-ins (from_json + higher-order array functions), zero
Python, map-only except the stated aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MESSAGE_SCHEMA = "array<struct<role: string, content: string>>"


def conversation_stats(
    df: DataFrame, json_col: str, id_col: str
) -> DataFrame:
    """Structural audit of chat transcripts (one JSON message array
    per row): message/role counts, per-role character volume, and the
    two format invariants SFT loaders enforce —

    - ``starts_with_system``: first message's role is 'system';
    - ``alternation_ok``: after any LEADING system messages, roles
      strictly alternate user/assistant starting with user (the
      OpenAI-chat convention every template assumes; a violated
      transcript silently mis-templates);
    - ``ends_with_assistant``: the transcript carries a trainable
      final completion.

    A row whose JSON fails to parse states NULL stats (from_json
    semantics) rather than raising — malformed rows are data to
    screen, not a crash. Map-only, zero Python. Returns (id_col,
    n_messages, n_system, n_user, n_assistant, user_chars,
    assistant_chars, starts_with_system, alternation_ok,
    ends_with_assistant)."""
    msgs = F.from_json(F.col(json_col), MESSAGE_SCHEMA)
    body = F.filter(
        msgs,
        lambda m, i: ~(
            (m.role == F.lit("system"))
            & (
                F.size(
                    F.filter(
                        F.slice(msgs, 1, i + 1),
                        lambda p: p.role != F.lit("system"),
                    )
                )
                == 0
            )
        ),
    )

    def role_count(role):
        return F.size(
            F.filter(msgs, lambda m: m.role == F.lit(role))
        ).cast("long")

    def role_chars(role):
        return F.aggregate(
            F.filter(msgs, lambda m: m.role == F.lit(role)),
            F.lit(0).cast("long"),
            lambda acc, m: acc + F.length(m.content),
        )

    alternation = F.forall(
        F.transform(
            body,
            lambda m, i: m.role
            == F.when(i % 2 == 0, F.lit("user")).otherwise(
                F.lit("assistant")
            ),
        ),
        lambda ok: ok,
    ) & (F.size(body) > 0)
    return df.select(
        F.col(id_col),
        F.size(msgs).cast("long").alias("n_messages"),
        role_count("system").alias("n_system"),
        role_count("user").alias("n_user"),
        role_count("assistant").alias("n_assistant"),
        role_chars("user").alias("user_chars"),
        role_chars("assistant").alias("assistant_chars"),
        # lazy when(size > 0, ...): an EMPTY transcript states NULL
        # for the first/last-message invariants instead of raising
        # under ANSI (element_at is strict about bounds AND index 0)
        F.when(
            F.size(msgs) > 0,
            F.element_at(msgs, 1).role == F.lit("system"),
        ).alias("starts_with_system"),
        alternation.alias("alternation_ok"),
        F.when(
            F.size(msgs) > 0,
            F.element_at(msgs, F.size(msgs)).role == F.lit("assistant"),
        ).alias("ends_with_assistant"),
    )


def chat_loss_spans(
    df: DataFrame, json_col: str, id_col: str
) -> DataFrame:
    """Loss-mask arithmetic for SFT packing: render each transcript
    with the fixed template ``<|{role}|>{content}<|end|>`` per message
    (4 + len(role) + len(content) + 7 chars) and emit one row per
    ASSISTANT turn with the [start, end) character span of its content
    inside the rendered string — exactly the assistant-only loss mask
    a trainer applies after tokenization-with-offsets. One
    higher-order aggregate folds (offset, spans) across the message
    array — map-only, zero Python; the rendered string itself is
    recoverable from the template and is pinned by tests, the
    relational contract being the integer span arithmetic. Returns
    (id_col, span_idx, loss_start, loss_end, rendered_chars);
    transcripts with no assistant turn produce no rows."""
    msgs = F.from_json(F.col(json_col), MESSAGE_SCHEMA)
    zero = F.struct(
        F.lit(0).cast("long").alias("pos"),
        F.array().cast(
            "array<struct<s: bigint, e: bigint>>"
        ).alias("spans"),
    )

    def step(acc, m):
        start = acc.pos + 4 + F.length(m.role)
        end = start + F.length(m.content)
        return F.struct(
            (end + 7).cast("long").alias("pos"),
            F.when(
                m.role == F.lit("assistant"),
                F.concat(
                    acc.spans,
                    F.array(
                        F.struct(
                            start.cast("long").alias("s"),
                            end.cast("long").alias("e"),
                        )
                    ),
                ),
            ).otherwise(acc.spans).alias("spans"),
        )

    folded = df.select(
        F.col(id_col), F.aggregate(msgs, zero, step).alias("__f")
    )
    return folded.select(
        id_col,
        F.col("__f.pos").alias("rendered_chars"),
        F.posexplode("__f.spans").alias("span_idx", "__sp"),
    ).select(
        id_col,
        "span_idx",
        F.col("__sp.s").alias("loss_start"),
        F.col("__sp.e").alias("loss_end"),
        "rendered_chars",
    )


def _texts_token_counts(
    base: DataFrame,
    id_col: str,
    txts_col: str,
    pairs: list,
    alphabet,
    pretokenize,
    per_elem_base: int,
    strategy: str = "auto",
) -> DataFrame:
    """Shared token-count core of the mask operators: extend ``base``
    (which must carry unique ``id_col`` rows and an array<string>
    column ``txts_col``) with ``__cnt`` — array<bigint> aligned with
    the texts, ``cnt[i] = per_elem_base + n_subword_tokens(txt[i])``,
    NULL for a NULL text (and a NULL array stays NULL). Subword
    tokenization matches
    :func:`~delta_lake_spark.operators.tokenizer.bpe_encode`, and so
    does the strategy contract:

    - ``"inline"``: zero shuffles, zero joins — the merge chain runs
      as one shallow HOF layer per merge over the nested per-text
      per-word symbol arrays of every word OCCURRENCE.
    - ``"vocab"``: the chain runs once per DISTINCT pre-token (the
      production shape at real merge counts — encode cost bounded by
      types x merges); per-text counts come back through a
      (text-index keyed) join + regroup, one id-keyed shuffle.
    - ``"auto"``: vocab once len(pairs) >= VOCAB_AUTO_MIN_MERGES.
    """
    from .tokenizer import (
        VOCAB_AUTO_MIN_MERGES,
        _apply_merge_chain,
        _byte_syms_expr,
        _chars_expr,
        _gpt2_words_expr,
        _resolve_pretokenize,
        _rewrite_body,
        _words_expr,
    )

    if strategy not in ("auto", "vocab", "inline"):
        raise ValueError(f"unknown strategy {strategy!r}")
    pretokenize = _resolve_pretokenize(pretokenize, alphabet)
    if strategy == "auto":
        strategy = (
            "vocab" if len(pairs) >= VOCAB_AUTO_MIN_MERGES else "inline"
        )
    seed = _chars_expr("x") if alphabet == "char" else _byte_syms_expr("x")
    base_lit = f"CAST({per_elem_base} AS BIGINT)"
    if strategy == "inline":
        words = (
            _gpt2_words_expr("t") if pretokenize == "gpt2"
            else _words_expr("t")
        )
        out = base.withColumn(
            "__sym",
            F.expr(
                f"transform({txts_col}, t -> transform({words},"
                f" x -> {seed}))"
            ),
        )
        for a, b in pairs:
            if a == b:
                raise ValueError(
                    "token loss masks require lhs != rhs merges"
                )
            out = out.withColumn(
                "__sym",
                F.expr(
                    "transform(__sym, ws -> transform(ws, s ->"
                    f" {_rewrite_body('s', a, b)}))"
                ),
            )
        return out.withColumn(
            "__cnt",
            F.expr(
                "transform(__sym, ws ->"
                f" aggregate(ws, {base_lit}, (a, w) -> a + size(w)))"
            ),
        ).drop("__sym")
    words = (
        _gpt2_words_expr("t") if pretokenize == "gpt2" else _words_expr("t")
    )
    wrow = base.select(
        F.col(id_col), F.posexplode(txts_col).alias("__ti", "t")
    ).select(
        id_col, "__ti", F.explode(F.expr(words)).alias("w")
    )
    types = wrow.select("w").distinct().select(
        "w",
        F.expr(
            f"element_at(transform(array(w), x -> {seed}), 1)"
        ).alias("toks"),
    )
    for a, b in pairs:
        if a == b:
            raise ValueError("token loss masks require lhs != rhs merges")
    seg = _apply_merge_chain(types, "toks", pairs).select(
        "w", F.size("toks").cast("long").alias("__n")
    )
    per_txt = (
        wrow.join(seg, "w")
        .groupBy(id_col, "__ti")
        .agg(F.sum("__n").alias("__wc"))
    )
    cmap = per_txt.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("__ti", "__wc"))
        ).alias("__cm")
    )
    return (
        base.join(cmap, id_col, "left")
        .withColumn(
            "__cnt",
            F.expr(
                f"transform({txts_col}, (t, i) ->"
                " IF(t IS NULL, CAST(NULL AS BIGINT),"
                f" {base_lit} + coalesce(element_at(__cm, i),"
                " CAST(0 AS BIGINT))))"
            ),
        )
        .drop("__cm")
    )


def _conv_token_counts(
    df: DataFrame,
    json_col: str,
    id_col: str,
    merges,
    alphabet,
    pretokenize,
    keep: tuple = (),
    strategy: str = "auto",
):
    """Per-MESSAGE token counts under the chat-template token
    convention — one special token per role marker, the content's
    subword tokens, one end-of-turn special (count = 2 +
    n_content_tokens) — via :func:`_texts_token_counts` over the
    parsed message contents (strategy contract documented there; the
    merge chain matches
    :func:`~delta_lake_spark.operators.tokenizer.bpe_encode`).
    Returns df extended with ``__msgs`` (the parsed array) and
    ``__cnt`` (array<bigint> of per-message token counts)."""
    from .tokenizer import _resolve_merge_pairs

    pairs = _resolve_merge_pairs(merges)
    parsed = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        F.from_json(F.col(json_col), MESSAGE_SCHEMA).alias("__msgs"),
    ).withColumn(
        "__txts", F.expr("transform(__msgs, m -> m.content)")
    )
    return _texts_token_counts(
        parsed, id_col, "__txts", pairs, alphabet, pretokenize,
        per_elem_base=2, strategy=strategy,
    ).drop("__txts")


def chat_token_loss_masks(
    df: DataFrame,
    json_col: str,
    id_col: str,
    merges,
    alphabet: str = "byte",
    pretokenize: str | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """TOKEN-level SFT loss masks — what a trainer actually consumes
    (q299's character spans are template arithmetic; the loss tensor
    is indexed by token position). Token convention per message:
    ``[<|role|> special] + subword tokens of content + [<|end|>
    special]`` — role markers and turn terminators are single special
    tokens (every production chat template reserves them), content is
    encoded with the learned BPE ``merges`` (byte alphabet + GPT-2
    pre-tokenization by default, matching
    :func:`~delta_lake_spark.operators.tokenizer.bpe_encode`). Emits
    one row per ASSISTANT turn with the [token_start, token_end)
    span of its CONTENT tokens — the assistant-only mask — plus the
    conversation's total token count for packing. The prefix sums
    and span selection run as higher-order array functions inside
    one projection chain; the per-message counts follow the
    bpe_encode ``strategy`` contract (zero-shuffle inline chain for
    small merge tables, per-DISTINCT-word encoding at production
    merge counts — see :func:`_texts_token_counts`). Transcripts
    with no assistant turn (or unparseable JSON) produce no rows.
    Returns (id_col, span_idx, token_start, token_end, n_tokens)."""
    out = _conv_token_counts(
        df, json_col, id_col, merges, alphabet, pretokenize,
        strategy=strategy,
    )
    spans = """
    CASE WHEN __cnt IS NULL OR size(__cnt) < 1 THEN
      array()
    ELSE filter(
      transform(sequence(1, size(__cnt)), i -> struct(
        element_at(__msgs, i).role AS role,
        aggregate(slice(__cnt, 1, i - 1), CAST(0 AS BIGINT),
                  (a, x) -> a + x) + 1 AS s,
        aggregate(slice(__cnt, 1, i - 1), CAST(0 AS BIGINT),
                  (a, x) -> a + x) + element_at(__cnt, i) - 1 AS e)),
      p -> p.role = 'assistant')
    END"""
    return out.select(
        F.col(id_col),
        F.expr(
            "aggregate(coalesce(__cnt, array()), CAST(0 AS BIGINT),"
            " (a, x) -> a + x)"
        ).alias("n_tokens"),
        F.posexplode(F.expr(spans)).alias("span_idx", "__sp"),
    ).select(
        id_col,
        "span_idx",
        F.col("__sp.s").alias("token_start"),
        F.col("__sp.e").alias("token_end"),
        "n_tokens",
    )


def sft_pack_with_masks(
    df: DataFrame,
    json_col: str,
    id_col: str,
    group_col: str,
    merges,
    budget: int,
    alphabet: str = "byte",
    pretokenize: str | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Packed-window composition of :func:`chat_token_loss_masks` —
    the relation an SFT trainer's dataloader reads: conversations
    concatenate per ``group_col`` in id order into a token stream
    split into ``budget``-sized windows (the q68/q261 concat-and-split
    packing convention), and every assistant mask span lands at its
    BIN-RELATIVE token position. A span crossing a window edge is
    SPLIT across the windows it intersects — exactly what happens to
    a sequence when packing splits it. One window shuffle on the
    group (the same shape as pack_sequences); everything else is the
    map-only mask arithmetic. Returns (group_col, bin_id, id_col,
    span_idx, token_start, token_end) with [token_start, token_end)
    bin-relative."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    out = _conv_token_counts(
        df, json_col, id_col, merges, alphabet, pretokenize,
        keep=(group_col,), strategy=strategy,
    ).withColumn(
        "__tot",
        F.expr(
            "aggregate(coalesce(__cnt, array()), CAST(0 AS BIGINT),"
            " (a, x) -> a + x)"
        ),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn(
        "__off", F.sum("__tot").over(w) - F.col("__tot")
    )
    spans = """
    CASE WHEN __cnt IS NULL OR size(__cnt) < 1 THEN
      array()
    ELSE filter(
      transform(sequence(1, size(__cnt)), i -> struct(
        element_at(__msgs, i).role AS role,
        __off + aggregate(slice(__cnt, 1, i - 1), CAST(0 AS BIGINT),
                  (a, x) -> a + x) + 1 AS s,
        __off + aggregate(slice(__cnt, 1, i - 1), CAST(0 AS BIGINT),
                  (a, x) -> a + x) + element_at(__cnt, i) - 1 AS e)),
      p -> p.role = 'assistant')
    END"""
    stream = out.select(
        F.col(group_col),
        F.col(id_col),
        F.posexplode(F.expr(spans)).alias("span_idx", "__sp"),
        # an EMPTY assistant content has nothing to mask — and its
        # zero-length span must not reach the descending-sequence
        # corner of the bin explode
    ).filter(F.col("__sp.e") > F.col("__sp.s"))
    return stream.select(
        group_col,
        F.explode(
            F.expr(
                f"sequence(__sp.s div {budget},"
                f" (__sp.e - 1) div {budget})"
            )
        ).alias("bin_id"),
        id_col,
        "span_idx",
        "__sp",
    ).select(
        group_col,
        "bin_id",
        id_col,
        "span_idx",
        F.greatest(
            F.col("__sp.s") - F.col("bin_id") * budget, F.lit(0)
        ).cast("long").alias("token_start"),
        F.least(
            F.col("__sp.e") - F.col("bin_id") * budget, F.lit(budget)
        ).cast("long").alias("token_end"),
    )


def serialize_conversations(
    df: DataFrame, json_col: str, id_col: str
) -> DataFrame:
    """Canonical role-aware serialization of chat transcripts — the
    text a conversation-level dedup keys on: one ``role: content``
    line per message, newline-joined, so role swaps and turn edits
    move the near-dup needle the way content edits do (a role-blind
    concat would call a user/assistant swap an exact dup). Role and
    content coalesce to '' BEFORE joining so the serialization stays
    injective over {role, content} messages — concat_ws would drop a
    NULL silently, making a NULL-content message collide with a
    NULL-role message carrying the same other field. Unparseable
    JSON serializes NULL (from_json semantics) — screened data, not a
    crash. Map-only, zero Python. Returns (id_col, conv_text)."""
    msgs = F.from_json(F.col(json_col), MESSAGE_SCHEMA)
    return df.select(
        F.col(id_col),
        F.array_join(
            F.transform(
                msgs,
                lambda m: F.concat(
                    F.coalesce(m.role, F.lit("")),
                    F.lit(": "),
                    F.coalesce(m.content, F.lit("")),
                ),
            ),
            "\n",
        ).alias("conv_text"),
    )


def conversation_near_dup_pairs(
    df: DataFrame,
    json_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.6,
    k: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_doc_freq: float | None = 0.1,
) -> DataFrame:
    """Conversation-level near-duplicate pairs — pretraining dedup
    stops at documents, but SFT corpora duplicate at the TRANSCRIPT
    level (re-collected sessions, templated rollouts, A/B'd system
    prompts): serialize role-aware
    (:func:`serialize_conversations`), then reuse the document
    MinHash+LSH machinery verbatim — banded buckets with the
    stop-shingle guard, exact jaccard verification over full shingle
    sets on candidates only
    (:func:`~delta_lake_spark.operators.dedup.minhash_lsh_pairs`).
    Same scale shape: one signature shuffle, bucket-confined pair
    generation, never all-pairs. Returns (id_1, id_2, jaccard)."""
    from .dedup import minhash_lsh_pairs

    ser = serialize_conversations(df, json_col, id_col).filter(
        F.col("conv_text").isNotNull()
    )
    return minhash_lsh_pairs(
        ser, "conv_text", id_col,
        n=n, threshold=threshold, k=k, bands=bands, seed=seed,
        max_doc_freq=max_doc_freq,
    )


def preference_decontaminate(
    df: DataFrame,
    prompt_col: str,
    id_col: str,
    eval_df: DataFrame,
    eval_text_col: str,
    eval_id_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: float | None = 0.1,
) -> DataFrame:
    """Screen preference pairs for PROMPT-side eval leakage — the
    decontamination step a DPO/RLHF data release runs before training
    (a prompt that near-duplicates a benchmark item teaches the model
    the benchmark): word-``n``-gram jaccard between every pair's
    prompt and the eval set via the cross-corpus MinHash band join
    (:func:`~delta_lake_spark.operators.dedup.cross_corpus_near_dups`
    — the eval set rides the helper's BATCH side, honoring its
    small-broadcasting-side contract, so the preference corpus can
    never be the side a future explicit broadcast picks; the corpus
    side is never self-joined). Every input row is returned with its
    verdict. Returns (id_col, n_eval_matches, max_jaccard NULL when
    clean, contaminated)."""
    from .dedup import cross_corpus_near_dups

    hits = cross_corpus_near_dups(
        eval_df.select(
            F.col(eval_id_col).alias(id_col),
            F.col(eval_text_col).alias("__txt"),
        ),
        df.select(F.col(id_col), F.col(prompt_col).alias("__txt")),
        "__txt",
        id_col,
        n=n,
        threshold=threshold,
        max_doc_freq=max_doc_freq,
    )
    per_id = hits.groupBy("corpus_id").agg(
        F.count("*").cast("long").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
    return (
        df.select(id_col)
        .join(per_id, F.col(id_col) == F.col("corpus_id"), "left")
        .select(
            id_col,
            F.coalesce("n_eval_matches", F.lit(0).cast("long")).alias(
                "n_eval_matches"
            ),
            "max_jaccard",
            F.col("corpus_id").isNotNull().alias("contaminated"),
        )
    )


def dpo_token_masks(
    df: DataFrame,
    prompt_col: str,
    chosen_col: str,
    rejected_col: str,
    id_col: str,
    merges,
    alphabet: str = "byte",
    pretokenize: str | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """TOKEN masks for preference (DPO/RLHF) pairs — the two numbers a
    DPO trainer needs per branch: where the completion tokens start
    and end inside each rendered sequence. Both branches render as
    ``[<|user|>] prompt tokens [<|end|>] [<|assistant|>] completion
    tokens [<|end|>]``, so the completion span starts at
    ``n_prompt_tokens + 3`` in BOTH (the stated invariant: DPO
    logprobs are compared over completion tokens at identical
    positions). Content tokenizes like
    :func:`~delta_lake_spark.operators.tokenizer.bpe_encode` (byte
    alphabet + GPT-2 pre-tokens by default); the three texts count
    through the shared :func:`_texts_token_counts` core over a
    3-element array, inheriting its ``strategy`` contract (inline:
    one shared merge-chain projection, zero shuffles; vocab:
    per-DISTINCT-word encoding at production merge counts). Returns
    (id_col, prompt_tokens, completion_start, chosen_end,
    chosen_total, rejected_end, rejected_total) with
    [completion_start, *_end) the per-branch completion span and
    *_total the branch's full sequence length including specials."""
    from .tokenizer import _resolve_merge_pairs

    pairs = _resolve_merge_pairs(merges)
    base = df.select(
        F.col(id_col),
        F.expr(
            f"array({prompt_col}, {chosen_col}, {rejected_col})"
        ).alias("__txts"),
    )
    out = _texts_token_counts(
        base, id_col, "__txts", pairs, alphabet, pretokenize,
        per_elem_base=0, strategy=strategy,
    )
    np_, nc, nr = (
        F.expr("element_at(__cnt, 1)"),
        F.expr("element_at(__cnt, 2)"),
        F.expr("element_at(__cnt, 3)"),
    )
    start = np_ + 3  # [user special] prompt [end special] [asst special]
    return out.select(
        F.col(id_col),
        np_.alias("prompt_tokens"),
        start.alias("completion_start"),
        (start + nc).alias("chosen_end"),
        (start + nc + 1).alias("chosen_total"),
        (start + nr).alias("rejected_end"),
        (start + nr + 1).alias("rejected_total"),
    )


def conversation_decontaminate(
    df: DataFrame,
    json_col: str,
    id_col: str,
    eval_df: DataFrame,
    eval_json_col: str,
    eval_id_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_doc_freq: float | None = 0.1,
) -> DataFrame:
    """TRANSCRIPT-level eval decontamination — q213's leakage screen
    lifted to conversations: an SFT corpus must not contain
    transcripts that near-duplicate held-out eval dialogues (the
    whole-conversation analogue of prompt-side
    :func:`preference_decontaminate`). Both relations serialize
    role-aware (:func:`serialize_conversations`), then the
    cross-corpus MinHash band join with exact jaccard verification
    (the eval set as the helper's small-broadcasting BATCH side, the
    SFT corpus as the corpus side); every input transcript returns
    with its verdict. Returns (id_col, n_eval_matches, max_jaccard
    NULL when clean, contaminated)."""
    from .dedup import cross_corpus_near_dups

    ser = serialize_conversations(df, json_col, id_col)
    eser = serialize_conversations(eval_df, eval_json_col, eval_id_col)
    hits = cross_corpus_near_dups(
        eser.filter(F.col("conv_text").isNotNull()).select(
            F.col(eval_id_col).alias(id_col), "conv_text"
        ),
        ser.filter(F.col("conv_text").isNotNull()),
        "conv_text",
        id_col,
        n=n,
        threshold=threshold,
        max_doc_freq=max_doc_freq,
    )
    per_id = hits.groupBy("corpus_id").agg(
        F.count("*").cast("long").alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )
    return (
        df.select(id_col)
        .join(per_id, F.col(id_col) == F.col("corpus_id"), "left")
        .select(
            id_col,
            F.coalesce("n_eval_matches", F.lit(0).cast("long")).alias(
                "n_eval_matches"
            ),
            "max_jaccard",
            F.col("corpus_id").isNotNull().alias("contaminated"),
        )
    )


def rejection_sample_topk(
    df: DataFrame,
    prompt_col: str,
    completion_col: str,
    reward_col: str,
    id_col: str,
    k: int = 1,
) -> DataFrame:
    """Rejection-sampling (best-of-n / RFT) data builder — the step
    that turns sampled rollouts + reward scores into an SFT corpus:
    per prompt, drop EXACT-duplicate completions first (keeping the
    highest-reward instance — a duplicate carries zero extra signal
    but would double its gradient weight), then keep the top-``k``
    survivors by reward (ties break on the smaller id, so the
    verdict is deterministic under equal rewards). Every input row
    returns with its verdict: ``is_dup`` (lost the per-completion
    dedup), ``rank`` (1-based among survivors of its prompt, NULL for
    dups), ``kept``. Two windows on the prompt key — no other
    shuffle, no Python. Returns (id_col, prompt_col, reward_col,
    is_dup, rank, kept)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w_dup = Window.partitionBy(prompt_col, completion_col).orderBy(
        F.desc(reward_col), F.asc(id_col)
    )
    out = df.withColumn("__rn", F.row_number().over(w_dup)).withColumn(
        "is_dup", F.col("__rn") > 1
    )
    # dup rows still participate in the numbering but sort LAST
    # (is_dup asc first), so survivor ranks are exactly 1..n_survivors
    # and the dup rows' numbers are never emitted
    w_rank = Window.partitionBy(prompt_col).orderBy(
        F.col("is_dup").asc(), F.desc(reward_col), F.asc(id_col)
    )
    out = out.withColumn(
        "rank",
        F.when(~F.col("is_dup"), F.row_number().over(w_rank)).cast("int"),
    )
    return out.select(
        id_col,
        prompt_col,
        reward_col,
        "is_dup",
        "rank",
        F.coalesce(F.col("rank") <= k, F.lit(False)).alias("kept"),
    )


# the document-tier PII regexes (text.redact_pii), reused verbatim so
# the chat scrub states the same contract
def chat_pii_scrub(
    df: DataFrame, json_col: str, id_col: str
) -> DataFrame:
    """Per-TURN PII scrub of chat transcripts — the compliance pass a
    post-training corpus runs message by message (document-level
    redaction would blind the audit to WHICH turn leaked): every
    message's content is screened with the document tier's exact
    regexes (emails, long digit runs — text.redact_pii's contract)
    and redacted in place; the transcript re-serializes to JSON with
    the same {role, content} shape so the scrubbed corpus feeds the
    same loaders. Map-only higher-order built-ins, zero Python.
    Returns (id_col, n_emails, n_longnums, n_dirty_messages,
    redacted_convo)."""
    from .text import EMAIL_RE, LONGNUM_RE

    msgs = F.from_json(F.col(json_col), MESSAGE_SCHEMA)

    def redact(content):
        return F.regexp_replace(
            F.regexp_replace(content, EMAIL_RE, "<EMAIL>"),
            LONGNUM_RE,
            "<NUM>",
        )

    def n_hits(content, pat, pre=None):
        base = content if pre is None else F.regexp_replace(
            content, pre, "<EMAIL>"
        )
        return F.size(F.regexp_extract_all(base, F.lit(pat), F.lit(0)))

    return df.select(
        F.col(id_col),
        F.aggregate(
            msgs,
            F.lit(0).cast("long"),
            lambda a, m: a + n_hits(m.content, EMAIL_RE),
        ).alias("n_emails"),
        F.aggregate(
            msgs,
            F.lit(0).cast("long"),
            lambda a, m: a + n_hits(m.content, LONGNUM_RE, pre=EMAIL_RE),
        ).alias("n_longnums"),
        F.size(
            F.filter(
                msgs,
                lambda m: (
                    n_hits(m.content, EMAIL_RE)
                    + n_hits(m.content, LONGNUM_RE, pre=EMAIL_RE)
                )
                > 0,
            )
        ).cast("long").alias("n_dirty_messages"),
        F.to_json(
            F.transform(
                msgs,
                lambda m: F.struct(
                    m.role.alias("role"),
                    redact(m.content).alias("content"),
                ),
            )
        ).alias("redacted_convo"),
    )


def preference_pair_audit(
    df: DataFrame,
    prompt_col: str,
    chosen_col: str,
    rejected_col: str,
    id_col: str,
) -> DataFrame:
    """Integrity audit of (prompt, chosen, rejected) preference pairs
    — the screens every DPO/RLHF data pipeline runs first:

    - ``identical_pair``: chosen == rejected (carries zero preference
      signal; a known labeling-pipeline failure mode);
    - ``chosen_longer``: the length-bias flag — a corpus where this
      is nearly always true teaches a length heuristic, and the
      corpus-level rate is the first number a DPO data review asks
      for;
    - ``prompt_dup_count``: how many pairs share this prompt
      (legitimate for multi-sample ranking data, a leakage smell when
      unexpected).

    One window over the prompt; everything else map-only. Returns
    (id_col, chosen_chars, rejected_chars, chosen_longer,
    identical_pair, prompt_dup_count)."""
    w = Window.partitionBy(prompt_col)
    return df.select(
        F.col(id_col),
        F.length(chosen_col).cast("long").alias("chosen_chars"),
        F.length(rejected_col).cast("long").alias("rejected_chars"),
        (F.length(chosen_col) > F.length(rejected_col)).alias(
            "chosen_longer"
        ),
        (F.col(chosen_col) == F.col(rejected_col)).alias(
            "identical_pair"
        ),
        F.count("*").over(w).cast("long").alias("prompt_dup_count"),
    )
