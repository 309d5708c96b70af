"""Insertion-ordered set ADT — parity for the transect helper the
reference ships (data_cube_utilities/transect/ordered_set.py:3-60, the
classic doubly-linked-list recipe used to dedup line-scan path cells while
preserving traversal order).

This implementation leans on dict's guaranteed insertion order (Python
3.7+) instead of a hand-rolled linked list — same API and semantics,
a third of the code and O(1) for every operation except pop(last=False),
which dict makes O(n) (the transect caller only pops from the end).

Distributed twin: for an ARRAY column the equivalent first-occurrence
dedup is `F.array_distinct`, which mlops.line_scan already applies on the
pixel-trail path; this ADT covers the driver-side API surface.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator, MutableSet


class OrderedSet(MutableSet):
    """A set that iterates in insertion order."""

    def __init__(self, iterable: Iterable | None = None):
        self._d: dict = {}
        if iterable is not None:
            for item in iterable:
                self._d[item] = None

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key) -> bool:
        return key in self._d

    def add(self, key) -> None:
        self._d[key] = None

    def discard(self, key) -> None:
        self._d.pop(key, None)

    def __iter__(self) -> Iterator:
        return iter(self._d)

    def __reversed__(self) -> Iterator:
        return reversed(self._d)

    def pop(self, last: bool = True):
        """Remove and return the last (or first) element, matching the
        reference's signature."""
        if not self._d:
            raise KeyError("set is empty")
        key = next(reversed(self._d)) if last else next(iter(self._d))
        del self._d[key]
        return key

    def __eq__(self, other) -> bool:
        if isinstance(other, OrderedSet):
            # order-sensitive between OrderedSets, like the reference
            return len(self) == len(other) and list(self) == list(other)
        return set(self) == set(other)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({list(self)!r})"
