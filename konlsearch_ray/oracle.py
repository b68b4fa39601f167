"""Single-process pure-Python oracle: index + Boolean search + BM25.

Plays the role the reference's pytest goldens play (reference
test/test_konlsearch.py:191-254): the test-time source of truth for
AND/OR/PHRASE/complex doc-ID lists and BM25 (doc_id, score) tuples.

Boolean semantics reproduce the reference exactly:
- OR = union, AND = seed-with-first-then-intersect (reference
  inverted_index.py:111-114 — intersection with an empty first posting is
  empty either way), results ascending doc-ID sorted
  (inverted_index.py:116).
- PHRASE = AND result filtered by the reference's first-occurrence
  monotonicity quirk: each query token's FIRST occurrence position must be
  non-decreasing in query order (reference index.py:431-444,
  utility.py:25-26 — SURVEY.md Q5).
- complex = recursive binary AND/OR tree over result sets (reference
  index.py:72-77, 413-429).

BM25 is an extension fixed by our spec (the reference has no scoring —
SURVEY.md header note): k1 = 1.2, b = 0.75,
idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  (always-positive variant),
score(q,d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)),
query terms deduplicated, ties broken by ascending doc_id.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from konlsearch_ray.analyzer import normalize_query_tokens, tokenize

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    postings: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: tf}
    first_pos: dict[str, dict[int, int]] = field(default_factory=dict)  # term -> {doc: pos}
    doc_len: dict[int, int] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / max(1, len(self.doc_len))

    def add(self, doc_id: int, text: str) -> None:
        toks = tokenize(text)
        self.doc_len[doc_id] = len(toks)
        for pos, t in enumerate(toks):
            tfs = self.postings.setdefault(t, {})
            if doc_id not in tfs:
                tfs[doc_id] = 0
                self.first_pos.setdefault(t, {})[doc_id] = pos
            tfs[doc_id] += 1

    # --- Boolean search -------------------------------------------------
    def _ids(self, term: str) -> set[int]:
        return set(self.postings.get(term, ()))

    def search(self, tokens: list[str], mode: str) -> list[int]:
        toks = normalize_query_tokens(tokens)
        if mode == "PHRASE":
            return self._phrase(toks)
        result: set[int] = set()
        for i, t in enumerate(toks):
            ids = self._ids(t)
            if mode == "OR":
                result |= ids
            else:  # AND: seed then intersect (reference inverted_index.py:111-114)
                result = ids if i == 0 else (result & ids)
        return sorted(result)

    def search_min_should(self, tokens: list[str], m: int) -> list[int]:
        """minimum_should_match golden: docs in at least ``m`` of the
        DISTINCT query terms' posting sets (m=1 is OR, m=n is AND)."""
        if m < 1:
            raise ValueError(f"m must be >= 1, got {m}")
        toks = sorted(set(normalize_query_tokens(tokens)))
        if not toks or m > len(toks):
            return []
        from collections import Counter

        cnt: Counter = Counter()
        for t in toks:
            cnt.update(self._ids(t))
        return sorted(d for d, c in cnt.items() if c >= m)

    def _phrase(self, toks: list[str]) -> list[int]:
        out = []
        for d in self.search(toks, "AND"):
            positions = [self.first_pos[t][d] for t in toks]
            if all(positions[i] <= positions[i + 1] for i in range(len(positions) - 1)):
                out.append(d)
        return sorted(out)

    def search_complex(self, tree) -> list[int]:
        """tree = (left, right, 'AND'|'OR'); leaves are (tokens, mode) pairs."""
        return sorted(self._eval(tree))

    def _eval(self, node) -> set[int]:
        if len(node) == 2:  # leaf: (tokens, mode)
            return set(self.search(node[0], node[1]))
        left, right, op = node
        lset, rset = self._eval(left), self._eval(right)
        return (lset & rset) if op == "AND" else (lset | rset)

    # --- BM25 -----------------------------------------------------------
    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def bm25_topk(self, tokens: list[str], k: int) -> list[tuple[int, float]]:
        toks = sorted(set(normalize_query_tokens(tokens)))
        scores: dict[int, float] = {}
        avgdl = self.avgdl
        for t in toks:
            w = self.idf(t)
            for d, tf in self.postings.get(t, {}).items():
                dl = self.doc_len[d]
                s = w * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
                scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def build_oracle(doc_texts: dict[int, str]) -> OracleIndex:
    idx = OracleIndex()
    for doc_id in sorted(doc_texts):
        idx.add(doc_id, doc_texts[doc_id])
    return idx
