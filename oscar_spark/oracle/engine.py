"""Pure-Python reference engine — the rank-identity oracle.

Plays the role oscar's dual-implementation checks play in the reference
(cqr == tcqr asserted on every query,
reference/oscar-cmd/Workfunctions.cpp:1169-1191; symmetric-diff between two
completers, reference/oscar-cmd/LiveCompleter.cpp:116-130): an independent,
trivially-auditable implementation whose top-k (doc ids AND scores) the
Spark engine must reproduce exactly.

Uses the SAME pinned tokenizer, parser and BM25 module as the Spark path —
only the execution strategy differs (dict-of-dicts vs distributed index).
"""

from __future__ import annotations

from oscar_spark.functions.bm25 import bm25
from oscar_spark.functions.tokenize import tokenize
from oscar_spark.serve import parser


class OracleIndex:
    """In-memory inverted index + BM25 scorer over (doc_id, text) pairs."""

    def __init__(self, docs: list[tuple[int, str]],
                 fields: dict[int, dict[str, str]] | None = None):
        """docs: (doc_id, text) pairs; fields (optional): doc_id →
        ordered {key: value} indexed as `key:value` composite tokens
        (tf=1, synthetic position FIELD_POS_BASE+j, NOT counted in
        doc_len — matching the Spark build's fielded tokens)."""
        self.postings: dict[str, dict[int, int]] = {}
        # term → doc → positions in the FILTERED token stream (the same
        # numbering the positional index and tokens_pos use: short
        # tokens dropped BEFORE numbering)
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.doc_len: dict[int, int] = {}
        for doc_id, text in docs:
            toks = tokenize(text)
            self.doc_len[doc_id] = len(toks)
            for i, t in enumerate(toks):
                self.postings.setdefault(t, {}).setdefault(doc_id, 0)
                self.postings[t][doc_id] += 1
                self.positions.setdefault(t, {}).setdefault(
                    doc_id, []).append(i)
        self.field_keys: set[str] = set()
        if fields:
            from oscar_spark.config import FIELD_POS_BASE
            from oscar_spark.functions.tokenize import normalize_field_value
            for doc_id, kv in fields.items():
                for j, (k, v) in enumerate(kv.items()):
                    kn = normalize_field_value(k)
                    vn = normalize_field_value(v)
                    if not (kn and vn):
                        continue
                    self.field_keys.add(kn)
                    t = f"{kn}:{vn}"
                    self.postings.setdefault(t, {})[doc_id] = 1
                    self.positions.setdefault(t, {})[doc_id] = \
                        [FIELD_POS_BASE + j]
        self.n_docs = len(self.doc_len)
        total = sum(self.doc_len.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def expand_prefix(self, stem: str) -> list[str]:
        """Pinned prefix expansion (sorted, capped) — see config."""
        from oscar_spark.config import MAX_PREFIX_EXPAND
        return sorted(t for t in self.postings
                      if t.startswith(stem))[:MAX_PREFIX_EXPAND]

    def expand_wild(self, kind: str, stem: str) -> list[str]:
        """Pinned suffix/substring expansion (sorted, capped) —
        QT_SUFFIX / QT_SUBSTRING analog."""
        from oscar_spark.config import MAX_PREFIX_EXPAND
        if kind == "suffix":
            hit = (t for t in self.postings if t.endswith(stem))
        else:
            hit = (t for t in self.postings if stem in t)
        return sorted(hit)[:MAX_PREFIX_EXPAND]

    # --- set algebra (mirrors DecelledACOT::execute set ops,
    #     reference/oscar-cmd/DecelledACOT.cpp:73-98) ---
    def eval_node(self, node) -> set[int]:
        kind = node[0]
        if kind == "empty":
            return set()
        if kind == "term":
            return set(self.postings.get(node[1], {}))
        if kind == "phrase":
            return self.phrase_docs(list(node[1]))
        if kind == "prefix":
            out: set[int] = set()
            for t in self.expand_prefix(node[1]):
                out |= set(self.postings[t])
            return out
        if kind in ("suffix", "substr"):
            out = set()
            for t in self.expand_wild(kind, node[1]):
                out |= set(self.postings[t])
            return out
        left, right = self.eval_node(node[1]), self.eval_node(node[2])
        if kind == "and":
            return left & right
        if kind == "or":
            return left | right
        if kind == "not":
            return left - right
        if kind == "xor":
            return left ^ right
        raise ValueError(f"unknown node {kind}")

    def phrase_docs(self, toks: list[str]) -> set[int]:
        """Docs where toks appear ADJACENT in the filtered token stream
        (QT_EXACT semantics)."""
        if not toks:
            return set()
        cand = None
        for t in toks:
            d = set(self.positions.get(t, {}))
            cand = d if cand is None else cand & d
            if not cand:
                return set()
        out = set()
        for doc in cand:
            starts = set(self.positions[toks[0]][doc])
            for i, t in enumerate(toks[1:], start=1):
                starts &= {p - i for p in self.positions[t][doc]}
                if not starts:
                    break
            if starts:
                out.add(doc)
        return out

    # --- scoring ---
    def score(self, doc_id: int, terms: list[str]) -> float:
        """Σ over distinct query terms present in doc of BM25 (pinned rule)."""
        s = 0.0
        dl = self.doc_len[doc_id]
        for t in terms:
            tf = self.postings.get(t, {}).get(doc_id, 0)
            if tf:
                s += bm25(tf, dl, len(self.postings[t]), self.n_docs, self.avgdl)
        return s

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), ties broken score DESC then doc_id ASC."""
        node = parser.parse(query, field_keys=self.field_keys)
        docs = self.eval_node(node)
        terms = parser.query_terms(node, self.expand_prefix,
                                   self.expand_wild)
        scored = [(d, self.score(d, terms)) for d in docs]
        scored.sort(key=lambda x: (-x[1], x[0]))
        return scored[:k]

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))
