"""Round-7 operator tests: t38 BPE encode (fixed-chain, driver-visible)
and the sentinel-replace ≡ greedy-fold equivalence that its oracle and
fast path both rely on."""

import duckdb
import pytest
from pyspark.sql import functions as F

from nlp_data_pipeline_spark.operators.text_analytics import (
    _T38_MERGES,
    T38_SQL,
    t38_bpe_encode,
)


def _py_greedy_merge(word: str, merges) -> list[str]:
    """Reference BPE application: per merge, one leftmost-first
    non-overlapping pass where the just-created symbol never fuses as
    the LEFT side within the same pass (the fused-flag convention)."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


# words chosen to hit every tricky case: overlap runs (aaa/aaaa with an
# (a,a)-style self-merge), chain merges (t+h then th+e), boundary
# non-matches (xt•h must NOT merge inside), and merge-output re-matching
TRICKY = ["aaa", "aaaa", "ththx", "xth", "the", "then", "and", "rere", "onon"]


@pytest.mark.parametrize("merges", [[("a", "a")], _T38_MERGES])
def test_t38_sentinel_replace_equals_fold(spark, merges):
    """The sentinel-string replace chain (Spark fast path AND DuckDB
    oracle) must equal the explicit greedy fold on every tricky word."""
    df = spark.createDataFrame([(w,) for w in TRICKY], ["w"])
    s = F.regexp_replace("w", r"(\S)", "‹$1›")
    for a, b in merges:
        s = F.replace(s, F.lit(f"‹{a}›‹{b}›"), F.lit(f"‹{a}{b}›"))
    got = {
        r["w"]: r["toks"]
        for r in df.select(
            "w", F.split(F.replace(s, F.lit("›"), F.lit("")), "‹").alias("toks")
        ).collect()
    }
    for w in TRICKY:
        want = _py_greedy_merge(w, merges)
        assert got[w][1:] == want, (w, merges, got[w][1:], want)  # [0]=''


def test_t38_matches_duckdb_oracle(spark, sf_dir):
    """Driver-style comparison: the fixed-8-merge encode query vs its
    closed-form nested-replace DuckDB oracle."""
    got = [tuple(r) for r in t38_bpe_encode(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(T38_SQL).fetchall()]
    assert len(got) > 0 and got == want


def test_t38_compression_sane(spark, sf_dir):
    """Merging can only shrink token counts: chars >= tokens >= chars/2
    per doc for a chain of 2-symbol merges applied once each."""
    rows = t38_bpe_encode(spark, sf_dir).collect()
    for r in rows:
        assert r["n_bpe_tokens"] <= r["n_chars_in_words"]
        assert r["chars_per_token"] >= 1.0 or r["n_bpe_tokens"] == 0
