"""File-level min/max predicate pruning — the rule shared by the
Iceberg manifest-bounds reader and the Delta add.stats reader.

One function, one contract: given a file's [lo, hi] range for a column
(either end may be unknown) and a predicate ``col op value``, decide
whether the file COULD contain a matching row. Pruning is proof-based:
an unknown bound never prunes, so a file is skipped only when its known
range provably excludes the predicate."""

from __future__ import annotations

WHERE_OPS = ("=", "==", "<", "<=", ">", ">=")


def check_where(where) -> None:
    """Validate a [(col, op, value), ...] predicate list once at entry."""
    for pred in where or []:
        if len(pred) != 3 or pred[1] not in WHERE_OPS:
            raise ValueError(
                f"unsupported predicate {pred!r}: expected (col, op, value) "
                f"with op in {WHERE_OPS}"
            )


def range_may_match(lo, hi, op: str, val) -> bool:
    """Could a value x with lo ≤ x ≤ hi satisfy ``x op val``?"""
    if op in ("=", "=="):
        if lo is not None and val < lo:
            return False
        if hi is not None and val > hi:
            return False
        return True
    if op in (">", ">="):
        if hi is not None and (val > hi or (op == ">" and val == hi)):
            return False
        return True
    if op in ("<", "<="):
        if lo is not None and (val < lo or (op == "<" and val == lo)):
            return False
        return True
    return True  # unknown op: never prune (callers validate upstream)


def resolve_local(uri: str, base: str):
    """Resolve a lake-metadata file reference to a local filesystem path.

    Handles the forms real writers emit: plain relative paths (joined
    under ``base``), absolute paths, and ``file:`` URIs in all three
    spellings (``file:///x``, ``file:/x`` — Hadoop Path.toString —,
    ``file://localhost/x``). Non-local schemes and foreign authorities
    raise rather than resolving to a nonsense path under the table
    root."""
    import os
    from urllib.parse import urlparse

    if uri.startswith("file:"):
        p = urlparse(uri)
        if p.netloc not in ("", "localhost"):
            raise ValueError(f"remote file authority in {uri!r}")
        return p.path
    if "://" in uri:
        raise ValueError(f"non-local data file uri {uri!r}")
    if os.path.isabs(uri):
        return uri
    return os.path.join(base, uri)
