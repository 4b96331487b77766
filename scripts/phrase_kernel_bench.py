"""Micro-benchmark: round-3 (per-posting dict/set) vs round-4 (numpy
sorted-array) phrase adjacency kernel, isolated from Spark.

Workload = the worst case the round-3 VERDICT named: a phrase of two
stopwords in one full range (RANGE_SIZE=8192 docs per term, ~tf
positions each), where the old kernel pushed every decoded posting
through a Python dict and per-candidate sets.

Run: python scripts/phrase_kernel_bench.py   → one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

RANGE = 8192


def make_term(rng, n_docs, tf_mean):
    ids = np.sort(rng.choice(RANGE, size=n_docs, replace=False)).astype(
        np.int64)
    tfs = rng.poisson(tf_mean, size=n_docs).clip(1).astype(np.int64)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(tfs, out=offs[1:])
    # per-doc strictly increasing positions
    flat = np.concatenate([
        np.sort(rng.choice(200, size=int(t), replace=False))
        for t in tfs]).astype(np.int64)
    return ids, tfs, offs, flat


def old_kernel(terms):
    """Round-3 shape: doc→positions dicts, per-candidate Python sets
    (oscar_spark/serve/executor.py pre-round-4, VERDICT r3 'What's
    wrong' #1)."""
    tpos = []
    for ids, tfs, offs, flat in terms:
        posmap = {}
        for j, d in enumerate(ids.tolist()):
            posmap[d] = flat[offs[j]:offs[j + 1]]
        tpos.append(posmap)
    cand = set(tpos[0])
    for pm in tpos[1:]:
        cand &= set(pm)
    out = []
    for d in cand:
        starts = set(tpos[0][d].tolist())
        for i in range(1, len(tpos)):
            starts &= {p - i for p in tpos[i][d].tolist()}
            if not starts:
                break
        if starts:
            out.append(d)
    return sorted(out)


def new_kernel(terms):
    """Round-4 shape: sorted-array intersect + composite-key
    searchsorted adjacency (mirrors _score_phrase_ranges)."""
    t_ids = [t[0] for t in terms]
    cand = t_ids[0]
    for ids in t_ids[1:]:
        cand = np.intersect1d(cand, ids, assume_unique=True)
        if cand.size == 0:
            return []
    keys = []
    for ids, tfs, offs, flat in terms:
        idx = np.searchsorted(ids, cand)
        lens = offs[idx + 1] - offs[idx]
        csum = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(lens, out=csum[1:])
        gather = (np.arange(csum[-1], dtype=np.int64)
                  - np.repeat(csum[:-1], lens)
                  + np.repeat(offs[idx], lens))
        drep = np.repeat(np.arange(cand.size, dtype=np.int64), lens)
        keys.append((drep << 32) | flat[gather])
    starts = keys[0]
    for i in range(1, len(keys)):
        want = starts + i
        hit = np.searchsorted(keys[i], want)
        hit_c = np.minimum(hit, keys[i].size - 1)
        starts = starts[keys[i][hit_c] == want]
        if starts.size == 0:
            return []
    return cand[np.unique(starts >> np.int64(32))].tolist()


def bench(fn, terms, reps):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn(terms)
        best = min(best, time.perf_counter() - t0)
    return best, len(r)


def main():
    rng = np.random.RandomState(42)
    out = {}
    for label, n_docs, tf in (("stopword_pair_full_range", 8192, 20),
                              ("mid_df_pair", 1024, 5)):
        terms = [make_term(rng, n_docs, tf) for _ in range(2)]
        t_old, n_old = bench(old_kernel, terms, 3)
        t_new, n_new = bench(new_kernel, terms, 3)
        assert n_old == n_new, (label, n_old, n_new)
        out[label] = {"old_ms": round(t_old * 1e3, 2),
                      "new_ms": round(t_new * 1e3, 2),
                      "speedup": round(t_old / t_new, 1),
                      "matches": n_new}
        print(f"# {label}: old {t_old*1e3:.1f}ms  new {t_new*1e3:.1f}ms  "
              f"({t_old/t_new:.1f}x), {n_new} matching docs",
              file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
