"""Union-find with path compression + union-by-min-id.

The canonical cluster id is the MINIMUM ``image_id`` of the component
(deterministic across element orderings — SURVEY.md §7 "hard parts"), so the
driver-side structure and the distributed hash-to-min rounds in
``stages/cluster.py`` converge to byte-identical assignments.
"""

from __future__ import annotations


class UnionFind:
    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        if p == x:
            return x
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # union by min id → root is always the lexicographic minimum
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra

    def assignments(self) -> dict[str, str]:
        return {x: self.find(x) for x in list(self.parent)}
