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
    """Build the corpus as one Arrow table (deterministic for fixed args)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(vocab_size, rng), dtype=object)
    # Zipf-ish skew over the vocabulary (s ≈ 1.1), normalized.
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** -1.1
    probs /= probs.sum()

    repos, paths, commits, langs, contents = [], [], [], [], []
    ext_keys = list(_EXTS)
    repo_commit = {}
    base_rows = int(num_docs * (1 - dup_fraction))
    for i in range(base_rows):
        repo = f"org{i % 7}/repo{i % 23}"
        if repo not in repo_commit:
            repo_commit[repo] = "".join(rng.choice(list("0123456789abcdef"), 40))
        ext = ext_keys[i % len(ext_keys)]
        path = f"src/pkg{i % 13}/mod_{i}.{ext}"
        ntok = max(8, int(rng.normal(mean_tokens, mean_tokens / 3)))
        words = list(rng.choice(vocab, size=ntok, p=probs))
        # Head terms in ~90% of files, several occurrences.
        if rng.random() < 0.9:
            for ht in HEAD_TERMS:
                reps = int(rng.integers(1, 6))
                words.extend([ht] * reps)
        # Hangul comment tokens in ~10% of files.
        if rng.random() < 0.1:
            words.extend(rng.choice(_HANGUL_WORDS, size=int(rng.integers(1, 4))))
        # Sprinkle sanitize-set noise chars onto ~5% of tokens.
        for j in range(len(words)):
            if rng.random() < 0.05:
                words[j] = str(words[j]) + str(rng.choice(_NOISE))
        perm = rng.permutation(len(words))
        content = " ".join(str(words[int(p)]) for p in perm)
        repos.append(repo)
        paths.append(path)
        commits.append(repo_commit[repo])
        langs.append(_EXTS[ext])
        contents.append(content)
    # Exact duplicates: re-emit earlier contents under new (repo, path).
    ndup = num_docs - base_rows
    for k in range(ndup):
        src = int(rng.integers(0, base_rows))
        repo = f"org{(k + 3) % 7}/dup_repo{k % 5}"
        if repo not in repo_commit:
            repo_commit[repo] = "".join(rng.choice(list("0123456789abcdef"), 40))
        repos.append(repo)
        paths.append(f"src/dup/mod_{k}.py")
        commits.append(repo_commit[repo])
        langs.append("python")
        contents.append(contents[src])
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
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
    tag = f"docs={num_docs} seed={seed} v=2 {sorted(kw.items())}"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            if f.read() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = generate_corpus(num_docs, seed=seed, **kw)
    for i in range(0, table.num_rows, rows_per_file):
        pq.write_table(
            table.slice(i, rows_per_file),
            os.path.join(out_dir, f"part-{i // rows_per_file:05d}.parquet"),
        )
    with open(meta_path, "w") as f:
        f.write(tag)
    return out_dir
