"""Index catalog — reference S1-S4 parity (search.py:15-51).

The reference's "database" is one RocksDB path holding named indexes
registered under ``index:{name}`` keys. Here the database is a root
directory; an index is a subdirectory with an ``index_meta.json``; the
catalog is the directory listing. ``destroy`` is ``Rdict.destroy``
parity: remove the index's directory tree.
"""

from __future__ import annotations

import os
import shutil


def index_path(root: str, name: str) -> str:
    # Reject anything that could escape (or BE) the root: an empty name
    # would make destroy_index rmtree the whole catalog.
    if (not name or "/" in name or "\\" in name or name.startswith(".")
            or name != name.strip()):
        raise ValueError(f"invalid index name: {name!r}")
    return os.path.join(root, name)


def create_index(root: str, name: str) -> str:
    """Register (create the directory for) a named index; returns its path
    — pass it to ``build_index`` / ``IndexReader`` (reference
    search.py:28-33)."""
    p = index_path(root, name)
    os.makedirs(p, exist_ok=True)
    return p


def get_all_indexes(root: str) -> list[str]:
    """Names of all indexes under the root (reference search.py:35-45):
    a directory counts once it has an ``index_meta.json`` (i.e. a build
    started there)."""
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        if os.path.exists(os.path.join(root, name, "index_meta.json")):
            out.append(name)
    return out


def destroy_index(root: str, name: str) -> bool:
    """Delete the index tree (reference search.py:47-51 / Rdict.destroy).
    Returns True if something was removed."""
    p = index_path(root, name)
    if os.path.isdir(p):
        shutil.rmtree(p)
        return True
    return False
