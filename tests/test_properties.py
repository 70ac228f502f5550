"""Property-based tests (hypothesis) — SURVEY.md §5.2-4.

Invariants of the reference-parity string operators that must hold for
ARBITRARY input, not just fixtures: preprocess idempotence, tokenizer
postconditions, metric ranges. Strategies are kept small (text up to
~200 chars) and batched into a single Spark job per property so the
suite stays fast.
"""

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.functions.text import (
    STOP_WORDS,
    clean_text,
    sentences,
    tokenize,
    truncate_at_word,
)

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=200,
)


def _run_many(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r["out"] for r in df.select(col.alias("out")).collect()]


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_clean_text_idempotent_property(spark, texts):
    once = _run_many(spark, texts, clean_text("text"))
    twice = _run_many(spark, once, clean_text("text"))
    assert once == twice


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_tokenize_postconditions(spark, texts):
    all_tokens = _run_many(spark, texts, tokenize(clean_text("text")))
    for toks in all_tokens:
        for t in toks:
            assert len(t) > 2
            assert t.lower() not in STOP_WORDS
            assert " " not in t


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_sentences_postconditions(spark, texts):
    outs = _run_many(spark, texts, sentences(clean_text("text")))
    for sents in outs:
        for s in sents:
            assert len(s) > 10
            assert s == s.strip()
            assert not any(ch in s for ch in ".!?")


@settings(max_examples=5, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=60))
def test_truncate_bounds(spark, texts):
    outs = _run_many(spark, texts, truncate_at_word(clean_text("text"), 50))
    cleans = _run_many(spark, texts, clean_text("text"))
    for out, clean in zip(outs, cleans):
        if len(clean) <= 50:
            assert out == clean
        else:
            assert out.endswith("...")
            assert len(out) <= 53


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=60))
def test_word_overlap_in_unit_interval(spark, pairs):
    df = spark.createDataFrame(
        [(a if a.strip() else "x", b) for a, b in pairs], "orig string, summ string"
    )
    ow = F.array_distinct(F.filter(F.split(F.lower("orig"), r"\s+"), lambda t: t != F.lit("")))
    sw = F.array_distinct(F.filter(F.split(F.lower("summ"), r"\s+"), lambda t: t != F.lit("")))
    vals = [
        r["o"]
        for r in df.select(
            (F.size(F.array_intersect(ow, sw)) / F.greatest(F.size(ow), F.lit(1))).alias("o")
        ).collect()
    ]
    assert all(not math.isnan(v) and 0.0 <= v <= 1.0 for v in vals)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.sampled_from(["srcA", "srcB"]), st.integers(0, 5000)),
        min_size=1,
        max_size=40,
    )
)
def test_sequence_packing_invariants(spark, docs):
    """t29 packing must hold for ARBITRARY token counts — including
    zero-token docs and docs larger than a whole pack."""
    import nlp_data_pipeline_spark.operators.text_analytics as ta

    df = spark.createDataFrame(
        [
            (i, " ".join(["w"] * n) if n else "", "en", src, n)
            for i, (src, n) in enumerate(docs)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = ta.load_table
    try:
        ta.load_table = lambda s, d, t: df
        rows = sorted(
            ta.t29_sequence_packing(spark, "ignored").collect(),
            key=lambda r: (r.source, r.doc_id),
        )
    finally:
        ta.load_table = orig
    seq = ta._T29_SEQ_LEN
    offsets = {}
    for r in rows:
        assert r.start_off == offsets.get(r.source, 0)  # contiguous per shard
        offsets[r.source] = r.start_off + r.n_tokens
        assert r.first_pack == r.start_off // seq
        end = r.start_off + r.n_tokens
        expected_last = (end - 1) // seq if r.n_tokens else r.first_pack
        assert r.last_pack == expected_last
        assert r.spans_boundary == (r.last_pack > r.first_pack)
        # a doc never spans more packs than its size allows
        assert r.last_pack - r.first_pack <= r.n_tokens // seq + 1


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(0, 400), min_size=1, max_size=25))
def test_rag_chunking_invariants(spark, token_counts):
    """t32 chunking must tile ARBITRARY documents: empty docs yield one
    empty chunk, every token lands in ≥1 chunk, consecutive chunks
    overlap by exactly chunk−stride tokens (when both are full), and
    chunk fingerprints of identical windows agree."""
    import nlp_data_pipeline_spark.operators.text_analytics as ta

    df = spark.createDataFrame(
        [
            (i, " ".join(f"w{j}" for j in range(n)) if n else "", "en", "src", n)
            for i, n in enumerate(token_counts)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = ta.load_table
    try:
        ta.load_table = lambda s, d, t: df
        rows = ta.t32_rag_chunking(spark, "ignored").collect()
    finally:
        ta.load_table = orig
    chunk, stride = ta._T32_CHUNK, ta._T32_STRIDE
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(token_counts)))
    for doc_id, rs in by_doc.items():
        n = token_counts[doc_id]
        rs.sort(key=lambda r: r.chunk_idx)
        assert [r.chunk_start for r in rs] == list(range(0, max(n, 1), stride))
        covered = set()
        for r in rs:
            assert r.n_tokens == n
            assert r.n_chunk_tokens == min(chunk, n - r.chunk_start)
            covered.update(range(r.chunk_start, r.chunk_start + r.n_chunk_tokens))
        assert covered == set(range(n))  # every token in ≥1 chunk
        # consecutive full chunks share exactly chunk−stride tokens
        for a, b in zip(rs, rs[1:]):
            if a.n_chunk_tokens == chunk:
                assert (a.chunk_start + chunk) - b.chunk_start == chunk - stride


def test_bpe_fold_property_random_words(spark):
    """Property: the Catalyst aggregate-fold merge used by
    bpe_train/bpe_encode matches the Python greedy-left reference on
    adversarial symbol sequences (runs, overlaps, merged-symbol
    collisions like pair ('a','a') over 'aaaaa')."""
    import itertools

    from pyspark.sql import functions as F

    def py_merge(syms, a, b):
        out, fused = [], False
        for x in syms:
            if out and not fused and out[-1] == a and x == b:
                out[-1] = a + b
                fused = True
            else:
                out.append(x)
                fused = False
        return out

    # every word over {a, b} up to length 6 — covers all run/overlap
    # shapes — merged with pairs (a,a), (a,b), (b,a)
    words = [
        "".join(w)
        for n in range(2, 7)
        for w in itertools.product("ab", repeat=n)
    ]
    cases = [(w, a, b) for w in words for a, b in (("a", "a"), ("a", "b"), ("b", "a"))]
    df = spark.createDataFrame(cases, "word string, a string, b string")
    fused = (
        "aggregate(filter(split(word, ''), c -> c != ''),"
        " struct(cast(array() as array<string>) as out, false as fused),"
        " (st, x) -> if("
        "   size(st.out) > 0 and not st.fused"
        "   and element_at(st.out, -1) = a and x = b,"
        "   struct(concat(slice(st.out, 1, size(st.out) - 1),"
        "                 array(concat(a, b))), true),"
        "   struct(concat(st.out, array(x)), false)),"
        " st -> st.out)"
    )
    got = df.select("word", "a", "b", F.expr(fused).alias("merged")).collect()
    assert len(got) == len(cases)
    for r in got:
        assert r.merged == py_merge(list(r.word), r.a, r.b), (r.word, r.a, r.b)
