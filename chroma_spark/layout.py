"""On-disk format versioning for persisted index layouts.

The reference ships cross-version persistence tests
(``chromadb/test/property/test_cross_version_persist.py``) because index
layouts outlive the code that wrote them. Every layout dir (IVF
centroids/postings, sparse term-bucket postings) gets a ``_layout.json``
stamp ``{"format_version": N, "kind": ...}``; readers validate it and
refuse layouts from a NEWER engine with a clear error instead of
misreading partition columns. A missing stamp means a pre-versioning
layout (earlier builds of this engine) and is accepted as version 1.

The leading underscore keeps the stamp invisible to Spark's parquet
discovery (underscore-prefixed paths are ignored as metadata files).
"""

from __future__ import annotations

import json
import os

LAYOUT_FORMAT_VERSION = 1

# per-kind current format. dedup v2 = epoch-stamped rows + tombstones/
# sibling (incremental maintenance); v1 was a plain rewritten band table —
# a v1 reader would see dead rows, so v2 layouts refuse under v1 engines
KIND_FORMAT_VERSIONS = {"ivf": 1, "sparse": 1, "dedup": 2, "fts": 1}


class LayoutFormatError(ValueError):
    pass


def stamp_layout(path: str, kind: str) -> None:
    """Write the format stamp into a freshly-written layout dir."""
    os.makedirs(path, exist_ok=True)
    version = KIND_FORMAT_VERSIONS.get(kind, LAYOUT_FORMAT_VERSION)
    with open(os.path.join(path, "_layout.json"), "w") as f:
        json.dump({"format_version": version, "kind": kind}, f)


def check_layout(path: str, kind: str) -> None:
    """Validate a layout dir before reading it.

    Accepts: a matching stamp at or below the current format version, or
    no stamp at all (pre-versioning layout == v1). Refuses: a stamp from a
    newer format version, a different layout kind, or an unreadable stamp.
    """
    stamp_path = os.path.join(path, "_layout.json")
    if not os.path.exists(stamp_path):
        return  # pre-versioning layout: defined as format v1
    try:
        with open(stamp_path) as f:
            stamp = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        raise LayoutFormatError(f"unreadable layout stamp {stamp_path}: {e}") from e
    v = int(stamp.get("format_version", 1))
    ceiling = KIND_FORMAT_VERSIONS.get(kind, LAYOUT_FORMAT_VERSION)
    if v > ceiling:
        raise LayoutFormatError(
            f"index layout {path} was written by a newer engine "
            f"(format v{v}; this build reads <= v{ceiling}) — "
            "upgrade the engine or rebuild the index"
        )
    got_kind = stamp.get("kind", kind)
    if got_kind != kind:
        raise LayoutFormatError(
            f"index layout {path} is a {got_kind!r} layout, expected {kind!r}"
        )
