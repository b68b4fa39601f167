"""Normative tokenizer spec + vectorized Arrow batch analyzer.

Semantics derive from the reference's sanitize/tokenize/is_indexable chain
(reference index.py:27, 98-127, 111-113 — see SURVEY.md §2.2):

1. **sanitize** — strip every character in ``SANITIZE_CHARS`` (the exact
   reference charset; note ``[ ; . ' + - =`` are NOT stripped).
2. **split** — on whitespace (the reference unions mecab morphemes with a
   whitespace split; the morpheme analyzer is a pluggable slot — this
   sandbox has no mecab/Kiwi, so the normative default is the deterministic
   whitespace path, which is what all goldens are computed against).
3. **keep** a token iff it fully matches ``[A-Za-z]+`` (then **lowercased**
   — a spec'd deviation from the case-preserving reference, per
   BASELINE.json's "lowercase/ASCII fallback for code tokens") or fully
   matches ``[가-힣]+`` (kept as-is).

Derived per-document quantities (new, spec'd — the reference stores tokens
as an unordered *set* (index.py:98-102) so tf/positions do not exist there):

- ``tf(term, doc)`` — occurrence count of *term* in the kept ordered stream.
- ``first_pos(term, doc)`` — 0-based index of the term's **first**
  occurrence in the kept ordered stream. This powers the PHRASE check,
  which replicates the reference's first-occurrence monotonicity quirk
  (reference index.py:443-444, utility.py:25-26 — SURVEY.md Q5).
- ``doc_len(doc)`` — total kept tokens (Σ tf), the BM25 ``dl``.

The batch path (`analyze_batch`) is fully vectorized pyarrow.compute; the
row path (`tokenize`) is the single-process oracle used by tests and must
agree exactly. The DuckDB oracle SQL in ``__ray_entry__`` re-derives the
same spec with regexp_replace / regexp_split_to_array / list_filter.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Exact reference charset (reference index.py:27).
SANITIZE_CHARS = '@_!#$%^&*()<>?/\\|}{~:]",'
_SANITIZE_TABLE = str.maketrans("", "", SANITIZE_CHARS)
# Same class, escaped for RE2 (pyarrow) / DuckDB regexp.
SANITIZE_RE = r'[@_!#$%^&*()<>?/\\|}{~:\]",]'

ALPHA_RE = r"[A-Za-z]+"
HANGUL_RE = r"[가-힣]+"
_ALPHA = re.compile(ALPHA_RE)
_HANGUL = re.compile(HANGUL_RE)


def sanitize(text: str) -> str:
    """Strip the reference sanitize charset (reference index.py:111-113)."""
    return text.translate(_SANITIZE_TABLE)


def normalize_token(tok: str) -> str | None:
    """Keep-and-normalize one raw whitespace token, else None."""
    if _ALPHA.fullmatch(tok):
        return tok.lower()
    if _HANGUL.fullmatch(tok):
        return tok
    return None


def tokenize(text: str) -> list[str]:
    """Ordered kept-token stream of one document (single-process oracle path)."""
    out = []
    for raw in sanitize(text).split():
        t = normalize_token(raw)
        if t is not None:
            out.append(t)
    return out


def normalize_query_tokens(tokens: list[str]) -> list[str]:
    """Apply the same normalization to user query tokens.

    The reference passes raw caller tokens straight to the posting lookup
    (reference index.py:431-434); our spec normalizes them through the same
    analyzer so queries match what was indexed.
    """
    out = []
    for tok in tokens:
        t = normalize_token(sanitize(tok))
        if t is not None:
            out.append(t)
    return out


def _positions_in_runs(doc_idx: np.ndarray) -> np.ndarray:
    """Position in the kept stream per doc: running index within equal
    doc_idx runs. Requires NON-DECREASING doc_idx (the
    list_parent_indices / flatten order every caller produces) — the
    one shared implementation of the run-length trick."""
    n = len(doc_idx)
    pos = np.zeros(n, dtype=np.int32)
    if n:
        starts = np.flatnonzero(np.diff(doc_idx)) + 1
        seq = np.arange(n, dtype=np.int32)
        run_start = np.zeros(n, dtype=np.int32)
        run_start[starts] = seq[starts]
        run_start = np.maximum.accumulate(run_start)
        pos = seq - run_start
    return pos


def _emit_morph_union(texts: list[str], morphs) -> list[list[str]]:
    """Shared ordered emission for the morpheme analyzers (reference
    index.py:98-102 shape, ``morphs(w) ∪ split`` as a stream): each
    normalized word followed by its segmentation when it decomposes."""
    out = []
    for text in texts:
        toks = []
        for raw in sanitize(text).split():
            t = normalize_token(raw)
            if t is None:
                continue
            toks.append(t)
            toks.extend(morphs(t))
        out.append(toks)
    return out


def analyze_strings(col: pa.Array | pa.ChunkedArray) -> dict[str, np.ndarray]:
    """Vectorized analyzer over a string column.

    Returns flat numpy arrays describing every kept token occurrence:
    ``doc_idx`` (int64 index into the batch), ``term`` (object/str),
    ``pos`` (int32 position in the kept ordered stream of that doc).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sanitized = pc.replace_substring_regex(col, pattern=SANITIZE_RE, replacement="")
    toks = pc.utf8_split_whitespace(sanitized)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    # One keep-class pass; lowercasing runs on the kept subset only and is
    # the identity on Hangul, so results equal the two-pass formulation.
    keep = pc.match_substring_regex(flat, f"^({ALPHA_RE}|{HANGUL_RE})$")
    kept_terms = pc.utf8_lower(pc.filter(flat, keep))
    kept_parent = pc.filter(parent, keep)

    doc_idx = kept_parent.to_numpy(zero_copy_only=False).astype(np.int64)
    return {
        "doc_idx": doc_idx,
        "term": kept_terms.to_numpy(zero_copy_only=False),
        "pos": _positions_in_runs(doc_idx),
    }


class KoreanLexiconAnalyzer:
    """Bundled-lexicon morpheme analyzer — the pluggable slot (SURVEY.md ST1).

    The reference tokenizes with ``set(mecab.morphs(s)) | set(s.split())``
    (index.py:98-102): morphemes UNION whitespace tokens. mecab/Kiwi are
    not in this sandbox, so the normative stand-in is deterministic
    greedy longest-match segmentation over a lexicon (default: the
    bundled Korean morpheme + identifier-atom lexicon,
    data/lexicon.py): every kept token is emitted as-is, followed by its
    morphemes when the WHOLE token segments into ≥2 lexicon entries
    (greedy, full-or-nothing — the same rule the DuckDB oracle
    re-derives with a recursive CTE, so the analyzer is oracle-gated
    end-to-end). Applies to Hangul and ASCII tokens alike (compound
    identifiers segment the way compound nouns do). Memoized per worker;
    the lexicon is the per-worker state loaded once per actor in
    ``__init__`` — what ``IndexConfig(analyzer_factory=...)`` exists for.
    """

    def __init__(self, lexicon: list[str] | None = None):
        if lexicon is None:
            from konlsearch_ray.data.lexicon import DEFAULT_LEXICON

            lexicon = DEFAULT_LEXICON
        self.lexicon = set(lexicon)
        self.max_len = max((len(w) for w in lexicon), default=1)
        self._memo: dict[str, list[str]] = {}

    def _morphs(self, word: str) -> list[str]:
        hit = self._memo.get(word)
        if hit is not None:
            return hit
        out, i = [], 0
        while i < len(word):
            for ln in range(min(self.max_len, len(word) - i), 0, -1):
                if word[i:i + ln] in self.lexicon:
                    out.append(word[i:i + ln])
                    i += ln
                    break
            else:
                out = []  # not fully segmentable → no morpheme emission
                break
        if len(out) < 2:
            out = []  # single-morpheme segmentation adds nothing
        if len(self._memo) < 1_000_000:  # bounded per-worker cache
            self._memo[word] = out
        return out

    def tokenize_many(self, texts: list[str]) -> list[list[str]]:
        return _emit_morph_union(texts, self._morphs)


class MecabMorphemeAnalyzer:
    """Adapter for a REAL morphological analyzer — the reference's exact
    tokenizer shape (reference index.py:24, 98-102: tokens =
    ``set(mecab.morphs(s)) | set(s.split())``), expressed in this
    engine's ordered-stream form: every kept surface token is emitted
    as-is, followed by its morphemes when the analyzer splits it into
    ≥ 2 pieces (same emission rule as ``KoreanLexiconAnalyzer``, so the
    two are drop-in interchangeable via ``IndexConfig.analyzer_factory``).

    Import-guarded: requires one of the public Korean analyzers —
    ``python-mecab-ko`` (``mecab.MeCab()``, what the reference imports)
    or ``kiwipiepy`` (``Kiwi``). Neither ships in this sandbox, so tests
    cover the duck-typed injection path and the ImportError fallback;
    on a cluster with mecab installed the factory works unchanged:
    ``IndexConfig(analyzer_factory=MecabMorphemeAnalyzer)``.

    ``backend``: optional pre-built object exposing ``morphs(text) ->
    list[str]`` (dependency injection for tests / custom analyzers).
    """

    def __init__(self, backend=None):
        if backend is None:
            backend = self._load_backend()
        self._m = backend
        self._memo: dict[str, list[str]] = {}

    @staticmethod
    def _load_backend():
        try:
            import mecab  # python-mecab-ko

            return mecab.MeCab()
        except ImportError:
            pass
        try:
            from kiwipiepy import Kiwi

            kiwi = Kiwi()

            class _KiwiMorphs:  # adapt to the mecab.morphs() protocol
                def morphs(self, text: str) -> list[str]:
                    return [t.form for t in kiwi.tokenize(text)]

            return _KiwiMorphs()
        except ImportError:
            raise ImportError(
                "MecabMorphemeAnalyzer needs python-mecab-ko or kiwipiepy; "
                "neither is installed. Use KoreanLexiconAnalyzer (bundled) "
                "or pass a backend exposing morphs(text) -> list[str].")

    def _morphs(self, word: str) -> list[str]:
        hit = self._memo.get(word)
        if hit is not None:
            return hit
        out = list(self._m.morphs(word))
        if len(out) < 2:
            out = []  # single-morpheme segmentation adds nothing
        if len(self._memo) < 1_000_000:  # bounded per-worker cache
            self._memo[word] = out
        return out

    def tokenize_many(self, texts: list[str]) -> list[list[str]]:
        return _emit_morph_union(texts, self._morphs)


def _coded_from_token_lists(
    token_lists: list[list[str]],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Adapter: per-row ordered token lists → the coded occurrence arrays
    (doc_idx, term_code, pos, dictionary) used by the build pipeline."""
    lens = np.array([len(t) for t in token_lists], dtype=np.int64)
    doc_idx = np.repeat(np.arange(len(token_lists), dtype=np.int64), lens)
    flat = [t for row in token_lists for t in row]
    arr = pa.array(flat, pa.string())
    denc = arr.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = (denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
             if len(flat) else np.zeros(0, dtype=np.int64))
    return doc_idx, codes, _positions_in_runs(doc_idx), denc.dictionary


def analyze_strings_coded(
    col: pa.Array | pa.ChunkedArray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Like ``analyze_strings`` but terms come back factorized: returns
    ``(doc_idx, term_code int32, pos, dictionary)``. Factorization uses
    Arrow ``dictionary_encode`` (C) — an order of magnitude faster than
    ``np.unique`` over a Python-object string array, which dominated the
    tokenizer profile."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    sanitized = pc.replace_substring_regex(col, pattern=SANITIZE_RE, replacement="")
    toks = pc.utf8_split_whitespace(sanitized)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    # One keep-class pass; lowercasing runs on the kept subset only and is
    # the identity on Hangul, so results equal the two-pass formulation.
    keep = pc.match_substring_regex(flat, f"^({ALPHA_RE}|{HANGUL_RE})$")
    kept_terms = pc.utf8_lower(pc.filter(flat, keep))
    kept_parent = pc.filter(parent, keep)

    denc = kept_terms.dictionary_encode()
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = denc.dictionary

    doc_idx = kept_parent.to_numpy(zero_copy_only=False).astype(np.int64)
    return doc_idx, codes, _positions_in_runs(doc_idx), dictionary


def analyze_batch_coded(
    batch: pa.Table, content_col: str, id_col: str = "doc_id",
    analyzer=None,
) -> tuple[dict[str, np.ndarray], pa.Array]:
    """Batch → grouped per-(doc, term) occurrence data with factorized
    terms: ``({doc_id, term_code, tf, first_pos}, dictionary)``. The
    group pass is a pure-int lexsort + run-length reduce.

    ``analyzer``: optional pluggable analyzer object exposing
    ``tokenize_many(texts) -> list[list[str]]`` (ordered kept tokens per
    row). None → the normative vectorized regex path."""
    doc_ids_np = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if analyzer is None:
        doc_idx, codes, pos, dictionary = analyze_strings_coded(batch[content_col])
    else:
        col = batch[content_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        doc_idx, codes, pos, dictionary = _coded_from_token_lists(
            analyzer.tokenize_many(col.to_pylist()))
    if len(doc_idx) == 0:
        z = np.zeros(0, dtype=np.int64)
        return ({"doc_id": z, "term_code": z, "tf": z.astype(np.int32),
                 "first_pos": z.astype(np.int32)}, dictionary)
    doc_id = doc_ids_np[doc_idx]
    # Group sort by (doc_id, term_code): a single combined-key stable
    # argsort is ~2x the speed of a 3-key lexsort at equal order — the
    # stream is doc-contiguous with ascending pos, so stability preserves
    # the within-group pos order the lexsort's tertiary key provided.
    dmin = doc_id.min()
    drel = doc_id - dmin
    nvocab = int(codes.max()) + 1 if len(codes) else 1
    if int(drel.max()) < (1 << 62) // (nvocab + 1):
        order = np.argsort(drel * (nvocab + 1) + codes, kind="stable")
    else:  # overflow-safe fallback for pathological doc-id spans
        order = np.lexsort((pos, codes, doc_id))
    doc_s, code_s, pos_s = doc_id[order], codes[order], pos[order]
    new_group = np.ones(len(doc_s), dtype=bool)
    if len(doc_s) > 1:
        new_group[1:] = (doc_s[1:] != doc_s[:-1]) | (code_s[1:] != code_s[:-1])
    group_start = np.flatnonzero(new_group)
    tf = np.diff(np.append(group_start, len(doc_s))).astype(np.int32)
    return (
        {
            "doc_id": doc_s[group_start],
            "term_code": code_s[group_start],
            "tf": tf,
            # pos sorted ascending within group → group_start row holds min.
            "first_pos": pos_s[group_start],
        },
        dictionary,
    )


def analyze_batch(
    batch: pa.Table, content_col: str, id_col: str = "doc_id"
) -> pa.Table:
    """Batch → per-(doc, term) rows: doc_id, term, tf, first_pos.

    Vectorized: pyarrow split/filter + one numpy lexsort-based group pass.
    Used by the tokenizer stage of the build pipeline; also emits nothing
    per doc — ``doc_len`` is recovered downstream as Σ tf per doc.
    """
    grouped, dictionary = analyze_batch_coded(batch, content_col, id_col)
    terms = (pc.take(dictionary, pa.array(grouped["term_code"]))
             if len(grouped["term_code"]) else pa.array([], pa.string()))
    return pa.table(
        {
            "doc_id": pa.array(grouped["doc_id"], pa.int64()),
            "term": terms.cast(pa.string()) if len(grouped["term_code"]) else terms,
            "tf": pa.array(grouped["tf"], pa.int32()),
            "first_pos": pa.array(grouped["first_pos"], pa.int32()),
        }
    )
