"""End-to-end Spark engine tests: build invariants (FIXTURES.md §4),
rank-identity vs the pure-Python oracle (ids AND scores), dual-path
equivalence (pruned == brute, the cqr==tcqr analog), extraction
byte-identity, and checkpoint resume."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from oscar_spark.config import NUM_TERM_BUCKETS, RANGE_SIZE, SCORE_ROUND
from oscar_spark.functions.codec import decode_block
from oscar_spark.functions.spark_hash import term_bucket
from oscar_spark.serve.executor import SearchEngine


@pytest.fixture(scope="module")
def engine(spark, built_index):
    d, _ = built_index
    return SearchEngine(spark, d)


# ---------- build invariants ----------

def test_build_counts(built_index, oracle):
    _, res = built_index
    assert res.n_docs == oracle.n_docs == 300
    assert res.avgdl == pytest.approx(oracle.avgdl)
    assert res.n_terms == len(oracle.postings)


def test_postings_strictly_increasing_and_block_ranges(spark, built_index):
    """FIXTURES.md inv 1 + 3 (ConsistencyCheckers.cpp:119-137 analog)."""
    d, _ = built_index
    rows = spark.read.parquet(f"{d}/postings").collect()
    by_term: dict[str, list] = {}
    for r in rows:
        ids, tfs, dls = decode_block(bytes(r["payload"]), r["doc_count"],
                                     r["range_id"] * RANGE_SIZE)
        assert (np.diff(ids) > 0).all()
        assert ids[0] == r["first_doc"] and ids[-1] == r["last_doc"]
        assert tfs.max() == r["max_tf"]
        assert dls.min() == r["min_dl"]
        assert (tfs >= 1).all() and (dls >= 1).all()
        assert r["bucket"] == term_bucket(r["term"], NUM_TERM_BUCKETS)
        by_term.setdefault(r["term"], []).append(
            (r["block_id"], r["first_doc"], r["last_doc"]))
    for term, blocks in by_term.items():
        blocks.sort()
        ids = [b[0] for b in blocks]
        assert ids == list(range(len(blocks)))  # dense block numbering
        for (_, _, last), (_, first, _) in zip(blocks, blocks[1:]):
            assert last < first  # non-overlapping, ordered


def test_df_matches_postings_and_oracle(spark, built_index, oracle):
    """FIXTURES.md inv 2: stored df == Σ block doc_counts == oracle df."""
    d, _ = built_index
    terms = {r["term"]: r["df"]
             for r in spark.read.parquet(f"{d}/terms").collect()}
    assert terms == {t: len(p) for t, p in oracle.postings.items()}


def test_postings_docs_exist_and_max_score(spark, built_index, oracle):
    """FIXTURES.md inv 3: doc ids ∈ doc_stats; max_score ≥ true block max.

    max_score is the bm25(max_tf, min_dl, df) upper bound (computed on
    the blocks table, not per posting) — assert it bounds the true max
    and equals the pinned formula exactly."""
    from oscar_spark.functions.bm25 import bm25
    d, _ = built_index
    doc_ids = {r["doc_id"]
               for r in spark.read.parquet(f"{d}/doc_stats").collect()}
    for r in spark.read.parquet(f"{d}/postings").collect():
        ids, tfs, dls = decode_block(bytes(r["payload"]), r["doc_count"],
                                     r["range_id"] * RANGE_SIZE)
        assert set(ids) <= doc_ids
        true_scores = [oracle.score(int(i), [r["term"]]) for i in ids]
        assert r["max_score"] >= max(true_scores) - 1e-9
        df_t = oracle.df(r["term"])
        assert r["max_score"] == pytest.approx(bm25(
            r["max_tf"], r["min_dl"], df_t, oracle.n_docs, oracle.avgdl))


def test_doc_stats_deterministic_order(spark, built_index):
    d, _ = built_index
    rows = spark.read.parquet(f"{d}/doc_stats").orderBy("doc_id").collect()
    key = [(-r["quality"], r["url"]) for r in rows]
    assert key == sorted(key)
    assert [r["doc_id"] for r in rows] == list(range(len(rows)))


def test_extraction_byte_identity(spark, pages_df):
    """FIXTURES.md inv 4: extractor(html) == text, byte-identical, in-Spark."""
    from oscar_spark.build.indexer import extract_pages
    re_extracted = extract_pages(pages_df.select("url", "warc_ts", "html", "lang"))
    diff = (re_extracted.alias("a")
            .join(pages_df.select("url", F.col("text").alias("expected")), "url")
            .filter(F.col("text") != F.col("expected")).count())
    assert diff == 0


def test_lineage(spark, built_index):
    d, res = built_index
    rows = spark.read.parquet(f"{d}/lineage").collect()
    assert rows and all(r["docs_per_sec"] > 0 for r in rows)
    assert all(r["input_fingerprint"] == rows[0]["input_fingerprint"]
               for r in rows)
    assert {r["partition_id"] for r in rows} <= set(range(NUM_TERM_BUCKETS))


# ---------- rank identity vs oracle ----------

QUERIES = [
    "the", "of and", "city + state", "time - year", "house ^ music",
    "war history world", "first + one + two", '"north south"',
    "wd0001", "wd0100 + the", "missingterm", "the - the",
    "(city + state) war", "river county home",
]


@pytest.mark.parametrize("q", QUERIES)
def test_rank_identity(engine, oracle, q):
    expected = oracle.search(q, k=10)
    got = engine.search(q, k=10, mode="brute")
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, gs), (_, es) in zip(got, expected):
        assert round(gs, SCORE_ROUND) == round(es, SCORE_ROUND)


@pytest.mark.parametrize("q", ["the", "of and", "city + state",
                               "war history world", "wd0001",
                               "first + one + two"])
def test_dual_path_equivalence(engine, q):
    """pruned == brute (cqr == tcqr analog, Workfunctions.cpp:1169-1191).

    Run the pruned path BOTH ways: single-phase (small-query fast path)
    and forced two-phase seed/θ/prune (the at-scale path)."""
    brute = engine.search(q, k=10, mode="brute")
    try:
        engine.PRUNE_MIN_POSTINGS = 0  # force two-phase
        two_phase = engine.search(q, k=10, mode="pruned")
    finally:
        del engine.PRUNE_MIN_POSTINGS
    single = engine.search(q, k=10, mode="pruned")
    for got in (two_phase, single):
        assert [d for d, _ in got] == [d for d, _ in brute]
        for (_, ps), (_, bs) in zip(got, brute):
            assert round(ps, SCORE_ROUND) == round(bs, SCORE_ROUND)


def test_dont_crash_queries(engine):
    for q in ["((foo (( bar))", "+-(%foo - %+bar)", "()", "foo + () bar",
              "-foo", "foo ^", '"unterminated', "", ")))((("]:
        engine.search(q, k=5)  # must not raise


# ---------- resume (FIXTURES.md inv 6) ----------

def test_resume_equivalence(spark, pages_df, tmp_path):
    from oscar_spark.build.indexer import build_index
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, pages_df, d1)
    # interrupted build: doc_stats committed, later stages missing
    import json, os, shutil
    os.makedirs(d2)
    shutil.copytree(f"{d1}/doc_stats", f"{d2}/doc_stats")
    m = json.load(open(f"{d1}/_manifest.json"))
    m["snapshots"] = {"doc_stats": m["snapshots"]["doc_stats"]}
    m["next_snapshot_id"] = 2
    json.dump(m, open(f"{d2}/_manifest.json", "w"))
    res = build_index(spark, pages_df, d2, resume=True)
    assert res.resumed_stages == ["doc_stats"]
    for table in ["doc_stats", "terms"]:
        a = {tuple(r) for r in spark.read.parquet(f"{d1}/{table}").collect()}
        b = {tuple(r) for r in spark.read.parquet(f"{d2}/{table}").collect()}
        assert a == b
    a = {(r["term"], r["block_id"], bytes(r["payload"]))
         for r in spark.read.parquet(f"{d1}/postings").collect()}
    b = {(r["term"], r["block_id"], bytes(r["payload"]))
         for r in spark.read.parquet(f"{d2}/postings").collect()}
    assert a == b


def test_resume_skips_tokens_stage(spark, pages_df, tmp_path):
    """Interrupted after the tokens checkpoint: resume must not
    re-tokenize, and the final index must equal a from-scratch build."""
    from oscar_spark.build.indexer import build_index
    import json, shutil
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, pages_df, d1)
    os_mk = __import__("os").makedirs
    os_mk(d2)
    shutil.copytree(f"{d1}/tokens", f"{d2}/tokens")
    m = json.load(open(f"{d1}/_manifest.json"))
    m["snapshots"] = {"tokens": m["snapshots"]["tokens"]}
    m["next_snapshot_id"] = 2
    json.dump(m, open(f"{d2}/_manifest.json", "w"))
    res = build_index(spark, pages_df, d2, resume=True)
    assert res.resumed_stages == ["tokens"]
    a = {(r["term"], r["block_id"], bytes(r["payload"]))
         for r in spark.read.parquet(f"{d1}/postings").collect()}
    b = {(r["term"], r["block_id"], bytes(r["payload"]))
         for r in spark.read.parquet(f"{d2}/postings").collect()}
    assert a == b


def test_resume_rejects_changed_input(spark, pages_df, built_index,
                                      tmp_path):
    """Fingerprint mismatch → full rebuild, not a stale skip."""
    from oscar_spark.build.indexer import build_index
    d = str(tmp_path / "c")
    build_index(spark, pages_df.limit(100), d)
    res = build_index(spark, pages_df, d, resume=True)
    assert res.resumed_stages == []
    assert res.n_docs == 300


@pytest.mark.parametrize("q", ["wd00*", "ci* + st*", "the wd01*", "zz*"])
def test_prefix_rank_identity(engine, oracle, q):
    """QT_PREFIX: engine expansion == oracle expansion, rank-identical."""
    expected = oracle.search(q, k=10)
    got = engine.search(q, k=10, mode="brute")
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, gs), (_, es) in zip(got, expected):
        assert round(gs, SCORE_ROUND) == round(es, SCORE_ROUND)
    pruned = engine.search(q, k=10, mode="auto")
    assert [d for d, _ in pruned] == [d for d, _ in expected]


@pytest.mark.parametrize("q", ["*ar", "*ty", "*or*", "*th* - the",
                               "*01", "city + *ar", "*", "**", "*zzz*"])
def test_suffix_substring_rank_identity(engine, oracle, q):
    """QT_SUFFIX / QT_SUBSTRING: same pinned expansion both engines,
    rank-identical results (incl. degenerate star-only queries)."""
    expected = oracle.search(q, k=10)
    got = engine.search(q, k=10, mode="auto")
    assert [d for d, _ in got] == [d for d, _ in expected]
    for (_, gs), (_, es) in zip(got, expected):
        assert round(gs, SCORE_ROUND) == round(es, SCORE_ROUND)


def test_wildcard_fallback_paths(spark, built_index, engine):
    """Above TERMS_PRELOAD_MAX the dictionary is not preloaded: prefix
    expansion becomes a sorted-terms range scan and suffix expansion a
    rev-prefix scan on the terms_rev mirror — both must agree with the
    driver-side preloaded expansion exactly."""
    d, _ = built_index
    orig = SearchEngine.TERMS_PRELOAD_MAX
    SearchEngine.TERMS_PRELOAD_MAX = 0
    try:
        eng2 = SearchEngine(spark, d)
        assert eng2._term_sorted is None
        assert eng2._terms_rev is not None
        assert eng2.expand_prefix("ci") == engine.expand_prefix("ci")
        assert eng2.expand_wild("suffix", "ty") == \
            engine.expand_wild("suffix", "ty")
        assert eng2.expand_wild("substr", "or") == \
            engine.expand_wild("substr", "or")
        # ≥3-char substring takes the trigram-index path
        assert eng2._terms_ngram is not None
        assert eng2.expand_wild("substr", "tor") == \
            engine.expand_wild("substr", "tor")
        for q in ["ci*", "*ty", "*or*", "*tor*", "wd00* + the"]:
            assert eng2.search(q, k=10) == engine.search(q, k=10), q
    finally:
        SearchEngine.TERMS_PRELOAD_MAX = orig


def test_pagination_and_cursor(engine):
    """seek/pagination (OsmItemSetIterator::seek analog,
    LiveCompleter.cpp:154-167): pages are exact slices of the full
    ranking; the cursor detects exhaustion on rare terms."""
    full = engine.search("the", k=30)
    assert len(full) == 30
    assert engine.search_page("the", k=10, offset=10) == full[10:20]
    cur = engine.cursor("the", page=7)
    got = cur.take() + cur.take() + cur.take()
    assert got == full[:21]
    cur.seek(25)
    assert cur.take(5) == full[25:30]
    # rare term: cursor must terminate with [] past the last hit
    rare_full = engine.search("wd0042", k=1000)
    cur2 = engine.cursor("wd0042", page=max(len(rare_full) // 2, 1))
    got2 = []
    for _ in range(len(rare_full) + 3):
        pg = cur2.take()
        if not pg:
            break
        got2.extend(pg)
    assert got2 == rare_full


def test_build_from_html_only(spark, pages_df, built_index, tmp_path):
    """A pages table carrying only raw html builds the identical index:
    build_index applies the pinned extractor itself (input_hint shape)."""
    from oscar_spark.build.indexer import build_index
    d = str(tmp_path / "htmlidx")
    res = build_index(spark, pages_df.drop("text"), d)
    _, ref = built_index
    assert (res.n_docs, res.n_terms, res.n_blocks) == \
        (ref.n_docs, ref.n_terms, ref.n_blocks)


def test_payload_dedup_end_to_end(spark, pages_df, oracle, tmp_path):
    """A7 (ItemIndexFactory analog, oscar-create/oscarcreate.cpp:74,
    100-115): duplicate posting payloads — endemic for the Zipf tail's
    hapax terms, which share (delta, tf=1, dl) bytes per doc — are
    stored once; serve re-attaches them by hash and stays
    rank-identical on both fetch paths."""
    from oscar_spark.build.indexer import build_index
    from oscar_spark.sources.tables import IndexStore
    d = str(tmp_path / "dedup_idx")
    build_index(spark, pages_df, d, dedup_payloads=True)
    store = IndexStore(d)
    assert store.get_meta("payload_dedup") is True
    stats = store.get_meta("payload_dedup_stats")
    assert stats["unique_payloads"] < stats["blocks"]
    # the payloads table holds exactly the distinct payloads
    assert store.read(spark, "payloads").count() == stats["unique_payloads"]
    eng = SearchEngine(spark, d)
    for q in ["the", "city + state", "war history world", "wd0042"]:
        expected = oracle.search(q, k=10)
        for mode in ("brute", "pruned"):
            got = eng.search(q, k=10, mode=mode)
            assert [x for x, _ in got] == [x for x, _ in expected], (q, mode)
            for (_, gs), (_, es) in zip(got, expected):
                assert round(gs, SCORE_ROUND) == round(es, SCORE_ROUND)


def test_pfor_codec_end_to_end(spark, pages_df, oracle, tmp_path):
    """Build with the PForDelta codec flag: manifest records it, serve
    dispatches on it, results stay rank-identical to the oracle."""
    from oscar_spark.build.indexer import build_index
    from oscar_spark.sources.tables import IndexStore
    d = str(tmp_path / "pfor_idx")
    build_index(spark, pages_df, d, codec="pfor")
    assert IndexStore(d).get_meta("codec") == "pfor"
    eng = SearchEngine(spark, d)
    for q in ["the", "city + state", "war history world", "wd0042"]:
        expected = oracle.search(q, k=10)
        got = eng.search(q, k=10)
        assert [x for x, _ in got] == [x for x, _ in expected]


def test_ef_codec_end_to_end(spark, pages_df, oracle, tmp_path):
    """Build with the Elias-Fano codec flag (third codec rung, analog
    of reference/data/configs/oscar-create/index_eliasfano.json):
    manifest records it, serve dispatches on it, results stay
    rank-identical to the oracle."""
    from oscar_spark.build.indexer import build_index
    from oscar_spark.sources.tables import IndexStore
    d = str(tmp_path / "ef_idx")
    build_index(spark, pages_df, d, codec="ef")
    assert IndexStore(d).get_meta("codec") == "ef"
    eng = SearchEngine(spark, d)
    for q in ["the", "city + state", "war history world", "wd0042"]:
        expected = oracle.search(q, k=10)
        got = eng.search(q, k=10)
        assert [x for x, _ in got] == [x for x, _ in expected]
