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
