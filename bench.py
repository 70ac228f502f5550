"""Benchmark harness: wall-clock per declared query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "suite_seconds", "value": <total>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full computation,
no driver-side collect cost). Streaming/model queries execute their own
actions and are timed around their terminal operation.

Usage:
    python bench.py                 # all queries
    python bench.py q01 t01 ...     # name-prefix filter
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


# Queries whose physical-plan fingerprint is KNOWN to drift across
# sessions without any code change — the md5 covers exprId-sensitive
# text, and these two classes re-derive it nondeterministically. A
# plan_changed entry for one of these carries its note in the output
# (VERDICT r10 #4: no unexplained plan_changed rows in the artifact);
# anything NOT listed here that flips is a real regression signal.
KNOWN_PLAN_NOISE = {
    # RewriteDistinctAggregates orders its Expand gid-groups by exprId
    # hash, so the session's first compile of a mixed distinct+exact agg
    # can permute instances (documented round 9, COVERAGE.md).
    "a02_hll_sketch_rollup": "distinct-agg Expand gid instance ordering",
    # LDA fit memoizes per (sf_dir, params) in-process; whether the memo
    # is warm changes which plan object the fingerprint reads.
    "n01_lda_topics": "LDA memo state (warm vs cold fit)",
    "n02_doc_tags": "LDA memo state (warm vs cold fit)",
    "n03_topic_metrics": "LDA memo state (warm vs cold fit)",
    # t41 has FOUR conditional count_distincts, so it rides the same
    # RewriteDistinctAggregates Expand-instance permutation as a02
    # (verified round 11: the only diff between a fresh-session and a
    # warm-session plan is the gid-group column order).
    "t41_vocab_growth": "distinct-agg Expand gid instance ordering",
    # q56 (countDistinct file_path + doc_id) and p07 (countDistinct
    # lang + content hash) carry the same multi-distinct Expand
    # permutation — verified round 14 by rebuilding each 3x in one
    # session: the ONLY diff is the Expand gid-group column order
    # ([_extract_file_path, doc_id] vs [doc_id, _extract_file_path]),
    # exchange counts identical.
    "q56_small_file_compaction": "distinct-agg Expand gid instance ordering",
    "p07_dataset_card": "distinct-agg Expand gid instance ordering",
    # (q30/q51 carried a one-time entry here for the r11 table-name
    # normalizer; removed in r12 once bench_full_r11 — the first
    # post-normalizer baseline — landed, so a future flip in either
    # query is a real signal again. ADVICE r11.)
    # (s16/s23/s33 carried a one-time entry here for the r14 BHJ→SMJ
    # seed-pack flip; removed in r15 per its own retirement note now
    # that bench_full_r14 is in the diff history — their r15 plan
    # changes are this round's deliberate NND restructures, documented
    # with before/after dumps in plans/r15/ and OPTIMIZATION_r15.md.)
}

# One-time note for the r12 call-site normalizer (below): every query
# whose plan carries a localCheckpoint scan gets a new md5 against the
# pre-fix r11 baseline. Self-retiring — applied only while the diff
# baseline is bench_full_r11 or older, so from r13 a flip in a
# checkpoint-carrying query is unexplained again unless truly new.
# ADVICE r12 cross-check (performed round 13): all 28 r11→r12 md5
# flips carry IDENTICAL struct_md5 AND n_exchanges vs bench_full_r11 —
# so none of the auto-annotated flips hid a real plan change from the
# same round's LP-cap/escalation refactor; only the full md5 (which
# embedded the JVM call site pre-normalizer) moved. The note is
# self-retiring: ckpt_note_active is False from the first r12-baseline
# diff, so a checkpoint-carrying flip is unexplained again from r13.
_CKPT_NOTE = (
    "one-time: localCheckpoint call-site normalizer added r12 — the "
    "pre-fix baseline md5 embeds the JVM reflective call site "
    "(NativeMethodAccessorImpl vs <unknown> after JIT accessor swap), "
    "the r11 p04/s33/t42 flips"
)


def _prep_multifile(spark, sf_dir: str, n_files: int = 32) -> str:
    """Rewrite the driver's single-file parquet tables as n_files-way
    directories under the temp dir (once, marker-gated) and bench against
    those. The driver files carry ONE row group, which caps every scan at
    1 task regardless of cluster size — a data-layout property, not an
    engine property (BASELINE.md's 10x probe). Real deployments never
    serve 100 TB from single files; the bench shouldn't either. Prep time
    is excluded from query timings. Disable: SPARK_GRAFT_BENCH_PREP=0.
    """
    from nlp_data_pipeline_spark.sources.catalog import TABLE_NAMES, load_table

    # Cache key includes a content fingerprint (every file's size+mtime
    # under sf_dir), not just the path: the driver regenerates the
    # testdata at the SAME path between rounds, and a path-only key would
    # silently serve the previous generation's rewrite.
    fp = hashlib.md5()
    for dirpath, _dirs, files in sorted(os.walk(sf_dir)):
        for fn in sorted(files):
            st = os.stat(os.path.join(dirpath, fn))
            fp.update(f"{os.path.relpath(os.path.join(dirpath, fn), sf_dir)}|{st.st_size}|{st.st_mtime_ns}\n".encode())
    from nlp_data_pipeline_spark.scratch import scratch_path

    key = hashlib.md5(f"{sf_dir}|{n_files}|v2|{fp.hexdigest()}".encode()).hexdigest()[:10]
    out = scratch_path(f"bench_prep_{key}")
    marker = os.path.join(out, "_PREPPED")
    if os.path.isdir(marker):
        return out
    t0 = time.time()
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        parts = 1 if name in ("region", "nation") else n_files
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    os.makedirs(marker, exist_ok=True)
    sys.stderr.write(f"[bench] prepped {n_files}-file tables in {time.time()-t0:.1f}s\n")
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus
    prefixes = tuple(sys.argv[1:])

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import __spark_entry__ as e
    from nlp_data_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    prep_enabled = os.environ.get("SPARK_GRAFT_BENCH_PREP", "1") != "0"
    prep_meta = {"enabled": prep_enabled, "layout": "as-given single-file"}
    if prep_enabled:
        sf_dir = _prep_multifile(spark, sf_dir)
        prep_meta["layout"] = "multi-file rewrite under tmp"
        prep_meta["n_files"] = 32

    # VERDICT r14 #2: the LDA fit memo's DISK layer (nlp_model.py)
    # persisted across bench runs, so a steady-state bench never timed
    # the CV+LDA fit (n01 read a model fitted in a PREVIOUS run). Wipe
    # both memo layers before EVERY timed sample of n01 — per-sample,
    # not just per-suite, because the min-of-N retry would otherwise
    # re-measure against the memo the first sample warmed and report
    # the warm number (observed: cold fit 20.2 s in sample 1, retry
    # 0.66 s, min reported 0.66 s). n01's row now IS the cold fit;
    # n02/n03/p03 share the in-process fit n01's last sample left —
    # intra-run reuse inside one timed suite, not cross-run caching.
    from nlp_data_pipeline_spark.operators.nlp_model import reset_fit_cache

    reset_fit_cache()  # never start a suite against a previous run's disk model
    PRE_MEASURE = {"n01_lda_topics": reset_fit_cache}

    # Warm one-time machinery so per-query numbers measure compute, not
    # initialization: JVM/codegen, the parquet read path, and the Python
    # worker pool (first Arrow exchange pays ~30s of worker spin-up).
    from nlp_data_pipeline_spark.sources.catalog import load_table

    load_table(spark, sf_dir, "lineitem").select("l_orderkey").limit(10).count()

    def _ident(it):
        yield from it

    spark.range(10).mapInPandas(_ident, "id long").count()

    # This host shows multi-second CPU-steal bursts that can inflate a
    # single measurement 10x (round-5 check: identical plans measured a
    # uniform ~1.45x slower than round 3 on the same data — pure
    # environment). Any query slower than RETRY_THRESHOLD_S is
    # re-measured once and the MIN is reported — the min of two runs is
    # a far better estimator of structural cost under bursty noise. At
    # 1.5s the slow tail (which dominates the suite total) is always
    # double-measured while the sub-second bulk keeps the suite fast.
    RETRY_THRESHOLD_S = 1.5
    # min-of-3 for the heavy tail (VERDICT r13 #6): round 13 recorded a
    # uniform 1.24x suite inflation on byte-identical plans — the >3s
    # cohort dominates the total, so one extra sample there buys most
    # of the variance reduction for ~5% more suite time, keeping the
    # 2x-vs-baseline margin measured rather than noise-bounded.
    HEAVY_THRESHOLD_S = 3.0

    def _measure(fn, pre=None):
        if pre is not None:
            pre()  # untimed: resets state the sample must re-compute
        t0 = time.time()
        df = fn(spark, sf_dir)
        _force(df)
        return round(time.time() - t0, 3), df

    def _plan_fingerprint(df) -> dict:
        """Stable physical-plan identity: expr/plan ids and temp paths
        normalized away so the SAME plan shape hashes identically across
        runs/rounds — lets future rounds diff 'did the plan change' per
        query without storing full explain output."""
        try:
            from nlp_data_pipeline_spark.plans.explain import formatted_plan

            p = formatted_plan(df)
            p = re.sub(r"#\d+", "#", p)
            p = re.sub(r"plan_id=\d+", "plan_id=", p)
            p = re.sub(r"\[id=#?\d*\]", "", p)
            p = re.sub(r"file:[\w\-./=]*", "<path>", p)
            p = re.sub(r"/tmp/[\w\-./=]*", "<path>", p)
            p = re.sub(r"/root/testdata/[\w\-./=]*", "<path>", p)
            # lambda vars carry a session-global counter (x_5, x_7, ...)
            p = re.sub(r"lambda [a-zA-Z]+_\d+#", "lambda v#", p)
            # localCheckpoint / Python-created scans embed the session-
            # global RDD id (MapPartitionsRDD[159]) — pure run noise
            p = re.sub(r"RDD\[\d+\]", "RDD[]", p)
            # ... and the checkpoint's recorded CALL SITE, which flips
            # between 'NativeMethodAccessorImpl.java:0' and
            # '<unknown>:0' once the JVM JIT replaces the reflective
            # py4j accessor with a generated one mid-session — pure
            # run-order noise (the r11 p04/s33/t42 plan_changed rows;
            # same rule as tools/bench_10x.py, where round 11 first
            # hit it on s33)
            # ([^,\n], not [^,]: a negated class without \n matches
            # across lines and would swallow the next plan line's
            # prefix up to its first comma, masking real diffs in the
            # region after the checkpoint scan — ADVICE r12)
            p = re.sub(
                r"localCheckpoint at [^,\n]*", "localCheckpoint at <site>", p
            )
            # ... and the SAME JIT accessor-swap noise on createDataFrame
            # scans: `Scan ExistingRDD` embeds `applySchemaToPythonRDD at
            # NativeMethodAccessorImpl.java:0`, which flips to
            # `<unknown>:0` once the JVM replaces the reflective py4j
            # accessor mid-session (observed round 14: n07/p07-class
            # createDataFrame queries flipping md5 between two
            # identical-HEAD full-suite runs with identical exchange
            # counts; fresh-session plans byte-identical).
            p = re.sub(
                r"applySchemaToPythonRDD at [^,\n]*",
                "applySchemaToPythonRDD at <site>",
                p,
            )
            # q30/q51 catalog tables are named <table>_bkt_/_cbo_ +
            # md5(sf_dir): a PATH-derived identity that leaks into the
            # scan node title (Scan parquet spark_catalog.default.
            # orders_bkt_xxxx) and flips whenever the driver regenerates
            # the testdata (new mtimes -> new prep-dir key). Same
            # normalization class as the <path> rules above.
            p = re.sub(r"_(bkt|cbo)_[0-9a-f]{6,12}", r"_\1_<key>", p)
            return {
                "plan_md5": hashlib.md5(p.encode()).hexdigest()[:12],
                # checkpoint-scan count: lets the one-time _CKPT_NOTE
                # annotation self-scope to the queries the r12 call-site
                # normalizer actually re-hashed
                "n_ckpt": p.count("localCheckpoint at <site>"),
                "n_exchanges": p.count("Exchange"),
                # ReusedExchange = a shuffle COMPUTED ONCE and read twice
                # (self-joins); counted inside n_exchanges above, so
                # real shuffle work = n_exchanges - n_reused
                "n_reused": p.count("ReusedExchange"),
                "n_python": p.count("Python") + p.count("ArrowEval"),
            }
        except Exception:
            return {"plan_md5": None, "n_exchanges": None, "n_python": None}

    # Previous round's per-query plan fingerprints (from the committed
    # bench_full_r{N}.json artifact): lets THIS run's driver-recorded
    # BENCH line carry a per-query plan_stable verdict, so "structure
    # unchanged, timing delta is host noise" is machine-checkable from
    # the artifact itself instead of trusted prose.
    here = os.path.dirname(os.path.abspath(__file__))
    prev_plans: dict[str, dict] = {}
    import glob as _glob

    prev_files = [
        (int(m.group(1)), p)
        for p in _glob.glob(os.path.join(here, "bench_full_r*.json"))
        if (m := re.search(r"bench_full_r(\d+)\.json$", p))
    ]
    baseline_round = max(prev_files)[0] if prev_files else None
    if prev_files:
        try:
            with open(max(prev_files)[1]) as f:
                prev_plans = json.load(f).get("queries", {})
        except Exception:
            prev_plans = {}
    # the call-site normalizer landed in r12, so only diffs against a
    # PRE-fix baseline (r11 or older) earn the one-time note
    ckpt_note_active = baseline_round is not None and baseline_round <= 11

    def _plan_stable(name: str, fp: dict):
        """True/False vs previous round; None when no prior fingerprint
        (new query) or either fingerprint failed to compute."""
        prev = prev_plans.get(name)
        if not prev or not prev.get("plan_md5") or not fp.get("plan_md5"):
            return None
        return bool(
            prev["plan_md5"] == fp["plan_md5"]
            and prev.get("n_exchanges") == fp.get("n_exchanges")
        )

    timings: dict[str, float] = {}
    full: dict[str, dict] = {}
    stability: dict[str, bool | None] = {}
    failures: dict[str, str] = {}
    for name, fn in e.queries().items():
        if prefixes and not name.startswith(prefixes):
            continue
        try:
            pre = PRE_MEASURE.get(name)
            t, df = _measure(fn, pre)
            if t > RETRY_THRESHOLD_S:
                t2, df = _measure(fn, pre)
                t = min(t, t2)
                if t > HEAVY_THRESHOLD_S:
                    t3, df = _measure(fn, pre)
                    t = min(t, t3)
            timings[name] = t
            fp = _plan_fingerprint(df)
            stability[name] = _plan_stable(name, fp)
            full[name] = {"sec": t, "plan_stable": stability[name], **fp}
        except Exception as ex:  # keep benching; report the failure
            failures[name] = f"{type(ex).__name__}: {ex}"
        sys.stderr.write(f"[bench] {name}: {timings.get(name, 'FAIL')}\n")

    out = {
        "metric": "suite_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # per-query: physical plan identical to the previous round's
        # bench_full artifact (normalized md5 + exchange count)? null =
        # new query / no prior fingerprint. A timing delta with
        # plan_stable=true is environment, not a plan regression.
        "plan_stable": stability,
        "plan_changed": sorted(k for k, v in stability.items() if v is False),
        # cause annotations for plan_changed entries with a KNOWN
        # session-nondeterministic fingerprint (see KNOWN_PLAN_NOISE);
        # a plan_changed entry absent from this dict is unexplained and
        # deserves investigation.
        "plan_change_notes": {
            k: KNOWN_PLAN_NOISE.get(k, _CKPT_NOTE)
            for k, v in stability.items()
            if v is False
            and (
                k in KNOWN_PLAN_NOISE
                or (ckpt_note_active and full.get(k, {}).get("n_ckpt"))
            )
        },
        # physical-layout provenance: numbers measured after the
        # multi-file prep are NOT comparable to timings on the driver's
        # single-row-group files (see _prep_multifile docstring)
        "prep": prep_meta,
    }
    if failures:
        out["failures"] = failures

    # Full per-query artifact committed in-repo: BENCH_r*.json tails
    # truncate to ~60 visible queries, so rounds could never diff the
    # whole suite. bench_full_r{N}.json records EVERY timing plus a
    # normalized plan fingerprint (did the physical plan change?).
    # N = next round inferred from the driver's recorded BENCH files;
    # only written for full-suite runs (a prefix-filtered run would
    # clobber the artifact with a subset).
    if not prefixes:
        rounds = [
            int(m.group(1))
            for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        n = (max(rounds) + 1) if rounds else 0
        full_out = {
            "round": n,
            "sf": sf,
            "prep": prep_meta,
            "suite_seconds": out["value"],
            "failures": failures,
            "queries": full,
        }
        with open(os.path.join(here, f"bench_full_r{n}.json"), "w") as f:
            json.dump(full_out, f, indent=1, sort_keys=True)

    print(json.dumps(out))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
