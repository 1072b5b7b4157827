"""Nested-TYPE path ancestry helpers, shared by mapping/prepare,
the Spark engine, and the local serving tier.

A nested path's IMMEDIATE nested ancestor is the longest declared
nested path that is a proper dotted prefix — objects in between do
not count as levels (``a.o.b`` nested under object ``o`` under
nested ``a`` has nested parent ``a``).  ``None`` means the root
document level.
"""

from __future__ import annotations

from typing import Iterable, List, Optional


def nested_parent_path(path: str,
                       nested_paths: Iterable[str]) -> Optional[str]:
    best: Optional[str] = None
    for p in nested_paths:
        if path.startswith(p + ".") and (best is None
                                         or len(p) > len(best)):
            best = p
    return best


def nested_depth(path: str, nested_paths: Iterable[str]) -> int:
    """Number of nested ancestors above ``path`` (0 = top level)."""
    d, cur = 0, nested_parent_path(path, nested_paths)
    while cur is not None:
        d += 1
        cur = nested_parent_path(cur, nested_paths)
    return d


def by_depth(nested_paths: Iterable[str]) -> List[str]:
    """Paths ordered shallow→deep (parents before children)."""
    ps = list(nested_paths)
    return sorted(ps, key=lambda p: (nested_depth(p, ps), p))
