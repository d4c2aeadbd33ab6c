"""Property-based invariants (hypothesis) for the BPE tokenizer and the
winnowing fingerprints: for ARBITRARY corpora over a small alphabet, the
driver and distributed BPE strategies must learn identical merge tables,
Spark encoding must equal the pure-Python greedy replay, and winnowing
must honor the Schleimer guarantee (a shared >= w+k-1-word run always
yields a shared fingerprint)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

words = st.text(alphabet="abc", min_size=1, max_size=6)
corpora = st.lists(
    st.lists(words, min_size=1, max_size=20), min_size=1, max_size=6
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


def _df(spark, corpus):
    return spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(corpus)],
        "doc_id long, text string",
    )


def _py_bpe_encode(word, pairs):
    s = list(word)
    for a, b in pairs:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora)
def test_bpe_strategies_agree_and_encode_replays(sp, corpus):
    from delta_lake_spark.operators.tokenizer import (
        bpe_encode,
        train_bpe_merges,
    )

    docs = _df(sp, corpus)
    fast = [
        tuple(r) for r in train_bpe_merges(docs, "text", n_merges=4).collect()
    ]
    dist = [
        tuple(r)
        for r in train_bpe_merges(
            docs, "text", n_merges=4, strategy="distributed"
        ).collect()
    ]
    assert fast == dist
    pairs = [(r[1], r[2]) for r in fast]
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(docs, "text", "doc_id", pairs).collect()
    }
    for i, ws in enumerate(corpus):
        expect = [tok for w in ws for tok in _py_bpe_encode(w, pairs)]
        assert got[i] == expect
    # the per-DISTINCT-word strategy states identical values
    vocab = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(
            docs, "text", "doc_id", pairs, strategy="vocab"
        ).collect()
    }
    assert vocab == got


unicode_words = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_categories=("Z", "C")
    ),
    min_size=1,
    max_size=6,
)
unicode_corpora = st.lists(
    st.lists(unicode_words, min_size=1, max_size=10), min_size=1, max_size=4
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=unicode_corpora)
def test_byte_bpe_strategies_agree_and_bytes_roundtrip(sp, corpus):
    """Byte-level alphabet over ARBITRARY unicode words: the driver and
    distributed strategies must learn identical merge tables, and the
    byte-fallback invariant must hold. Under the GPT-2 pre-tokenizer
    (the byte default) the pre-tokens PARTITION the text, so the hex
    tokens concatenate and unhex back to the exact UTF-8 bytes of the
    WHOLE document — whitespace included, whatever was merged."""
    from delta_lake_spark.operators.tokenizer import (
        bpe_encode,
        train_bpe_merges,
    )

    docs = _df(sp, corpus)
    fast = [
        tuple(r)
        for r in train_bpe_merges(
            docs, "text", n_merges=4, alphabet="byte"
        ).collect()
    ]
    dist = [
        tuple(r)
        for r in train_bpe_merges(
            docs, "text", n_merges=4, alphabet="byte",
            strategy="distributed",
        ).collect()
    ]
    assert fast == dist
    pairs = [(r[1], r[2]) for r in fast]
    got = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(
            docs, "text", "doc_id", pairs, alphabet="byte"
        ).collect()
    }
    expected = {
        i: " ".join(ws).encode("utf-8") for i, ws in enumerate(corpus)
    }
    for i in expected:
        assert bytes.fromhex("".join(got[i])) == expected[i]
    # the per-DISTINCT-word strategy states identical values on
    # arbitrary unicode under the GPT-2 pre-tokenizer
    vocab = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(
            docs, "text", "doc_id", pairs, alphabet="byte",
            strategy="vocab",
        ).collect()
    }
    assert vocab == got
    # the legacy lowercased-whitespace pre-tokenizer stays selectable
    # and keeps ITS invariant (whitespace dropped, words lowercased)
    from pyspark.sql import functions as F

    from delta_lake_spark.operators.tokenizer import _words_expr

    ws_pairs = [
        (r.lhs, r.rhs)
        for r in train_bpe_merges(
            docs, "text", n_merges=4, alphabet="byte",
            pretokenize="whitespace",
        ).collect()
    ]
    ws_got = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(
            docs, "text", "doc_id", ws_pairs, alphabet="byte",
            pretokenize="whitespace",
        ).collect()
    }
    ws_expected = {
        r.doc_id: "".join(r.ws).encode("utf-8")
        for r in docs.select(
            "doc_id", F.expr(_words_expr("text")).alias("ws")
        ).collect()
    }
    for i in ws_expected:
        assert bytes.fromhex("".join(ws_got[i])) == ws_expected[i]


# GPT-2 pre-tokenization reference: the ORIGINAL published pattern with
# its lookahead, over ASCII (where \p{L}/\p{N} are unambiguous) — the
# engine implementation must reproduce it exactly, lookahead-free.
_GPT2_ASCII_REF = __import__("re").compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+"
    r"| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

ascii_texts = st.text(
    alphabet="ab N0!,.'\t\n", min_size=0, max_size=40
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(ascii_texts, min_size=1, max_size=4))
def test_gpt2_pretokenize_matches_published_pattern(sp, texts):
    """The sentinel-based lookahead-free GPT-2 segmentation equals the
    published lookahead pattern on arbitrary ASCII (letters, digits,
    punctuation, contractions, space/tab/newline runs, leading and
    trailing whitespace), and the pre-tokens partition the text."""
    from pyspark.sql import functions as F

    from delta_lake_spark.operators.tokenizer import _gpt2_words_expr

    df = sp.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: list(r.w)
        for r in df.select(
            "doc_id", F.expr(_gpt2_words_expr("text")).alias("w")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _GPT2_ASCII_REF.findall(t), repr(t)
        assert "".join(got[i]) == t


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pre=st.lists(words, min_size=0, max_size=15),
    run=st.lists(words, min_size=8, max_size=12),  # >= w + k - 1 = 8
    post=st.lists(words, min_size=0, max_size=15),
)
def test_winnow_shared_run_guarantee(sp, pre, run, post):
    """Doc 1 = pre + run, doc 2 = run + post: the shared run of >= 8
    words must always produce at least one shared fingerprint, for
    arbitrary surrounding context."""
    from delta_lake_spark.operators.dedup import winnow_fingerprints

    docs = _df(sp, [pre + run, run + post])
    rows = winnow_fingerprints(docs, "text", "doc_id", k=5, w=4).collect()
    s1 = {r.fp for r in rows if r.doc_id == 0}
    s2 = {r.fp for r in rows if r.doc_id == 1}
    assert s1 & s2


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora)
def test_unigram_strategies_agree(sp, corpus):
    """For ARBITRARY corpora, the auto (driver) and distributed
    unigram-LM training paths must learn IDENTICAL vocabularies —
    counts and 9-dp probabilities both: the Viterbi score is a product
    of IEEE double divisions evaluated in the same order on both
    paths, so there is no tolerance here, only equality."""
    from delta_lake_spark.operators.tokenizer import train_unigram

    docs = _df(sp, corpus)
    kw = dict(vocab_size=16, n_iters=2, max_piece_len=3, seed_size=32)
    auto = sorted(map(tuple, train_unigram(docs, "text", **kw).collect()))
    dist = sorted(
        map(
            tuple,
            train_unigram(
                docs, "text", strategy="distributed", **kw
            ).collect(),
        )
    )
    assert auto == dist and len(auto) > 0


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora)
def test_wordpiece_strategies_agree_and_encode_is_maxmatch(sp, corpus):
    """Driver and distributed WordPiece training must be bit-equal
    (including the IEEE likelihood score), and greedy encoding against
    the learned vocab must equal the pure-Python MaxMatch replay."""
    from delta_lake_spark.operators.tokenizer import (
        train_wordpiece_merges,
        wordpiece_encode,
    )

    docs = _df(sp, corpus)
    fast = [
        tuple(r)
        for r in train_wordpiece_merges(docs, "text", n_merges=3).collect()
    ]
    dist = [
        tuple(r)
        for r in train_wordpiece_merges(
            docs, "text", n_merges=3, strategy="distributed"
        ).collect()
    ]
    assert fast == dist
    chars = {c for ws in corpus for w in ws for c in w}
    vocab = set(chars) | {"##" + c for c in chars} | {r[3] for r in fast}
    vlist = sorted(vocab)
    L = max(len(p) - (2 if p.startswith("##") else 0) for p in vlist)

    def py_wp(word):
        if not word or len(word) > 24:
            return ["[UNK]"]
        p, toks = 0, []
        while p < len(word):
            best = None
            for l in range(min(len(word) - p, L), 0, -1):
                key = word[p : p + l] if p == 0 else "##" + word[p : p + l]
                if key in vocab:
                    best = l
                    break
            if best is None:
                return ["[UNK]"]
            toks.append(
                word[p : p + best] if p == 0 else "##" + word[p : p + best]
            )
            p += best
        return toks

    for strategy in ("vocab", "inline"):
        got = {
            r.doc_id: list(r.tokens)
            for r in wordpiece_encode(
                docs, "text", "doc_id", vlist, strategy=strategy
            ).collect()
        }
        for i, ws in enumerate(corpus):
            expect = [tok for w in ws for tok in py_wp(w)]
            assert got[i] == expect, (strategy, i)


unicode_mixed = st.text(
    alphabet=st.characters(
        blacklist_characters="\x01",
        blacklist_categories=("Cs",),  # no lone surrogates
    ),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(unicode_mixed, min_size=1, max_size=3))
def test_gpt2_pretokens_partition_any_unicode(sp, texts):
    """The GPT-2 pre-tokens PARTITION arbitrary unicode text (emoji,
    CJK, combining marks, control chars — everything except the \\x01
    sentinel): concatenating the tokens reproduces the input exactly,
    and no token is empty. This is the invariant byte-level BPE's
    whole-document round-trip rests on."""
    from pyspark.sql import functions as F

    from delta_lake_spark.operators.tokenizer import _gpt2_words_expr

    df = sp.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: list(r.w)
        for r in df.select(
            "doc_id", F.expr(_gpt2_words_expr("text")).alias("w")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = got[i]
        assert "".join(toks) == t, repr(t)
        assert all(toks), repr(t)


special_surfaces = st.sampled_from(
    ["<|assistant|>", "<|user|>", "<|end|>", "<|system|>"]
)
plain_chunks = st.text(
    alphabet=st.characters(
        blacklist_characters="\x01\\\"", blacklist_categories=("Cs", "Cc")
    ),
    min_size=0,
    max_size=12,
)
adversarial_content = st.lists(
    st.one_of(plain_chunks, special_surfaces), min_size=1, max_size=4
).map("".join)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    contents=st.lists(adversarial_content, min_size=1, max_size=4),
    quote_role=st.booleans(),
)
def test_special_token_surfaces_cannot_alias_into_specials(
    sp, contents, quote_role
):
    """Adversarial special-token safety: user-controlled content that
    QUOTES the chat template's special-token surface strings
    ('<|assistant|>', '<|end|>', ...) must tokenize as ordinary
    content — per-message counts stay exactly 2 + bpe_encode token
    count of the content (the two specials are POSITIONAL, injected
    by the template renderer, never recognized from text), and a
    quoted '<|assistant|>' inside a user turn must never mint an
    assistant loss span."""
    import json

    from delta_lake_spark.operators.chat import chat_token_loss_masks
    from delta_lake_spark.operators.tokenizer import bpe_encode

    msgs = []
    for j, c in enumerate(contents):
        role = "user" if j % 2 == 0 else "assistant"
        if quote_role and j == 0:
            c = "<|assistant|>" + c + "<|end|>"
        msgs.append({"role": role, "content": c})
    convo = sp.createDataFrame(
        [(1, json.dumps(msgs))], "doc_id long, convo string"
    )
    merges = [("20", "3c"), ("7c", "3e"), ("61", "73"), ("73", "69")]
    got = chat_token_loss_masks(
        convo, "convo", "doc_id", merges, alphabet="byte"
    ).collect()
    # reference counts: encode each content as a standalone document
    docs = sp.createDataFrame(
        [(j, m["content"]) for j, m in enumerate(msgs)],
        "doc_id long, text string",
    )
    n_content = {
        r.doc_id: r.n_tokens
        for r in bpe_encode(
            docs, "text", "doc_id", merges, alphabet="byte"
        ).collect()
    }
    counts = [2 + n_content[j] for j in range(len(msgs))]
    # spans exist ONLY for genuine assistant-role turns, at positions
    # derived purely from the counts — quoting the surfaces moves
    # nothing but the content token count
    expect = []
    off = 0
    for j, m in enumerate(msgs):
        if m["role"] == "assistant":
            expect.append((1, off + 1, off + counts[j] - 1))
        off += counts[j]
    assert sorted((r.doc_id, r.token_start, r.token_end) for r in got) \
        == sorted(expect)
    for r in got:
        assert r.n_tokens == sum(counts)
