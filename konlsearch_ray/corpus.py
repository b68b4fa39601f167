"""Deterministic synthetic source-code corpus (BASELINE.json input_hint shape).

Schema: ``repo:string, path:string, commit:string, lang:string,
content:large_string`` — see FIXTURES.md F1. Seeded (default 42), Zipf-skewed
identifier vocabulary plus deliberate head terms (``def return import self
class``) in most files to exercise head-term skew, a small fraction of Hangul
comment tokens to cover the Hangul token class (reference index.py:116-127),
characters from the reference sanitize charset (reference index.py:27), and
~2% exact-duplicate ``content`` rows (distinct repo/path) for first-wins
dedup (reference index.py:299-305).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

HEAD_TERMS = ["def", "return", "import", "self", "class"]
_EXTS = {"py": "python", "java": "java", "go": "go", "rs": "rust"}
_HANGUL_WORDS = ["마법", "소녀", "모래", "특급", "특별", "건담", "주석", "함수"]
_NOISE = list('@_!#$%^&*()<>?/\\|}{~:]",')


def _alpha_suffix(i: int) -> str:
    """Base-26 alphabetic encoding — keeps identifiers inside ``[A-Za-z]+``
    so the analyzer retains them (digit-suffixed tokens would be dropped
    by the is_alpha/is_hangul filter and collapse the corpus vocabulary)."""
    out = []
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out.append(chr(ord("a") + r))
    return "".join(reversed(out))


def _vocab(size: int, rng: np.random.Generator) -> list[str]:
    syll = ["get", "set", "idx", "buf", "tok", "doc", "map", "arr", "str", "num",
            "tmp", "ctx", "cfg", "ptr", "len", "val", "key", "row", "col", "seg"]
    out = []
    for i in range(size):
        parts = rng.integers(1, 4)
        w = "".join(str(syll[int(rng.integers(0, len(syll)))]) for _ in range(parts))
        out.append(f"{w}{_alpha_suffix(i)}")
    return out


def generate_corpus(
    num_docs: int,
    seed: int = 42,
    vocab_size: int = 2000,
    mean_tokens: int = 120,
    dup_fraction: float = 0.02,
) -> pa.Table:
    """Build the corpus as one Arrow table (deterministic for fixed args).

    Fully vectorized (numpy fixed-width string ops) so multi-hundred-k-doc
    bench corpora generate in seconds rather than minutes.
    """
    rng = np.random.default_rng(seed)
    vocab = _vocab(vocab_size, rng)
    # Zipf-ish skew over the vocabulary (s ≈ 1.1), normalized.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()
    cum = np.cumsum(probs)

    ext_keys = list(_EXTS)
    base_rows = int(num_docs * (1 - dup_fraction))

    # Everything is generated as int32 codes into one token dictionary:
    # [vocab | noisy vocab | head | noisy head | hangul | noisy hangul].
    # "Noisy" variants carry one sanitize-set char (stripped by the
    # analyzer, so they tokenize to the base word — exercising sanitize).
    base_words = list(vocab) + HEAD_TERMS + _HANGUL_WORDS
    nb = len(base_words)
    noise_per_word = [
        _NOISE[int(rng.integers(0, len(_NOISE)))] for _ in range(nb)]
    dict_words = base_words + [
        w + c for w, c in zip(base_words, noise_per_word)]
    HEAD0 = vocab_size  # code of HEAD_TERMS[0] in base_words
    HANG0 = vocab_size + len(HEAD_TERMS)

    # Per-doc token counts.
    ntok = np.maximum(
        8, rng.normal(mean_tokens, mean_tokens / 3, size=base_rows).astype(np.int64))
    # Head terms in ~90% of files, 1-5 occurrences each; Hangul comment
    # tokens in ~10% of files, 1-3 tokens.
    has_head = rng.random(base_rows) < 0.9
    head_reps = rng.integers(1, 6, size=(base_rows, len(HEAD_TERMS)))
    head_reps[~has_head] = 0
    has_hangul = rng.random(base_rows) < 0.1
    n_hangul = rng.integers(1, 4, size=base_rows)
    n_hangul[~has_hangul] = 0
    total_len = ntok + head_reps.sum(axis=1) + n_hangul
    offsets = np.concatenate(([0], np.cumsum(total_len)))
    n_flat = int(offsets[-1])
    codes = np.empty(n_flat, dtype=np.int64)

    # Layout per doc: [vocab draws | head repeats | hangul]; the final
    # per-doc shuffle makes layout order irrelevant.
    doc_of = np.repeat(np.arange(base_rows), total_len)
    local = np.arange(n_flat) - offsets[doc_of]
    vocab_mask = local < ntok[doc_of]
    codes[vocab_mask] = np.searchsorted(cum, rng.random(int(ntok.sum())))
    head_cum = np.cumsum(head_reps, axis=1)
    head_local = local - ntok[doc_of]
    head_mask = (~vocab_mask) & (head_local < head_cum[doc_of, -1])
    hsel = np.zeros(int(head_mask.sum()), dtype=np.int64)
    hl = head_local[head_mask]
    hdoc = doc_of[head_mask]
    for h in range(len(HEAD_TERMS) - 1):
        hsel += hl >= head_cum[hdoc, h]
    codes[head_mask] = HEAD0 + hsel
    hang_mask = (~vocab_mask) & (~head_mask)
    codes[hang_mask] = HANG0 + rng.integers(
        0, len(_HANGUL_WORDS), size=int(hang_mask.sum()))

    # ~5% of tokens become the noisy variant (+nb offset in the dictionary).
    codes[rng.random(n_flat) < 0.05] += nb

    # Per-doc shuffle: random sort key within each doc.
    shuf = np.lexsort((rng.random(n_flat), doc_of))
    codes = codes[shuf]

    # Materialize token strings once via dictionary take, then join per doc.
    import pyarrow.compute as _pc

    flat_arr = _pc.take(
        pa.array(dict_words, pa.large_string()), pa.array(codes))
    toks_arr = pa.LargeListArray.from_arrays(
        pa.array(offsets, pa.int64()), flat_arr)
    contents_arr = _pc.binary_join(toks_arr, pa.scalar(" ", pa.large_string()))

    i_arr = np.arange(base_rows)
    repos = [f"org{i % 7}/repo{i % 23}" for i in i_arr]
    # One deterministic commit per repo.
    hexd = np.array(list("0123456789abcdef"))
    repo_names = sorted(set(repos))
    repo_commit = {
        r: "".join(rng.choice(hexd, 40)) for r in repo_names
    }
    exts = [ext_keys[i % len(ext_keys)] for i in i_arr]
    paths = [f"src/pkg{i % 13}/mod_{i}.{e}" for i, e in zip(i_arr, exts)]
    commits = [repo_commit[r] for r in repos]
    langs = [_EXTS[e] for e in exts]
    # Exact duplicates: re-emit earlier contents under new (repo, path).
    # Content stays Arrow throughout — a take() of the source rows, not a
    # Python-string round trip.
    ndup = num_docs - base_rows
    dup_src = rng.integers(0, base_rows, size=ndup)
    for k in range(ndup):
        repo = f"org{(k + 3) % 7}/dup_repo{k % 5}"
        if repo not in repo_commit:
            repo_commit[repo] = "".join(rng.choice(hexd, 40))
        repos.append(repo)
        paths.append(f"src/dup/mod_{k}.py")
        commits.append(repo_commit[repo])
        langs.append("python")
    dup_arr = _pc.take(contents_arr, pa.array(dup_src, pa.int64()))
    content_col = pa.concat_arrays([
        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
        for a in (contents_arr, dup_arr)])
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": content_col,
        }
    )


def write_corpus(
    out_dir: str, num_docs: int, seed: int = 42, rows_per_file: int = 8192, **kw
) -> str:
    """Write the corpus as a directory of Parquet files; returns the dir.

    Idempotent: skips generation when a matching ``_corpus_meta`` marker
    already exists (used by bench.py to cache the bench corpus under /tmp).
    """
    meta_path = os.path.join(out_dir, "_corpus_meta")
    tag = f"docs={num_docs} seed={seed} v=3 {sorted(kw.items())}"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if f.read() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    # Regeneration must clear STALE parts first: a smaller rebuild into
    # the same dir would otherwise leave old high-numbered part files
    # beside the new ones, and directory readers would ingest a silent
    # old/new mix.
    for name in os.listdir(out_dir):
        if name.startswith("part-") and name.endswith(".parquet"):
            os.remove(os.path.join(out_dir, name))
    if os.path.exists(meta_path):
        os.remove(meta_path)  # no marker while the dir is mid-rewrite
    table = generate_corpus(num_docs, seed=seed, **kw)
    for i in range(0, table.num_rows, rows_per_file):
        pq.write_table(
            table.slice(i, rows_per_file),
            os.path.join(out_dir, f"part-{i // rows_per_file:05d}.parquet"),
        )
    with open(meta_path, "w") as f:
        f.write(tag)
    return out_dir
