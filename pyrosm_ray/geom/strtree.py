"""Packed STR (Sort-Tile-Recursive) R-tree, bulk-loaded, pure numpy.

Replaces shapely's STRtree for the engine's spatial-join stages (the north
rule's PIP/kNN operators; reference seed: the bbox ``sjoin`` at
/root/reference/pyrosm/frames.pyx:231-241). Built once per actor in
``__init__`` over the polygon partition's bboxes, then queried per batch with
level-synchronous, fully vectorised traversal (no per-point Python loop).

STR bulk loading (Leutenegger et al., 1997): sort items by x-centre into
vertical slabs of ~sqrt(n/cap) leaves each, sort each slab by y-centre, pack
consecutive runs of ``cap`` items into leaves; repeat on leaf MBRs upward.
"""

from __future__ import annotations

import heapq
import math

import numpy as np


def _str_order(cx: np.ndarray, cy: np.ndarray, cap: int) -> np.ndarray:
    """Packing permutation: x-slabs then y within slab."""
    n = len(cx)
    n_leaves = max(1, math.ceil(n / cap))
    n_slabs = max(1, math.ceil(math.sqrt(n_leaves)))
    slab_items = n_slabs * cap
    order = np.argsort(cx, kind="stable")
    out = np.empty(n, dtype=np.int64)
    for s in range(0, n, slab_items):
        slab = order[s:s + slab_items]
        out[s:s + len(slab)] = slab[np.argsort(cy[slab], kind="stable")]
    return out


class STRtree:
    """Static R-tree over item bounding boxes ``(n, 4) [xmin, ymin, xmax, ymax]``."""

    def __init__(self, bboxes: np.ndarray, leaf_capacity: int = 16):
        bboxes = np.ascontiguousarray(bboxes, dtype=np.float64)
        self.n_items = len(bboxes)
        self.item_bboxes = bboxes
        self.leaf_capacity = leaf_capacity
        # levels[0] = permuted item boxes; each higher level packs the one below.
        self._levels: list[np.ndarray] = []   # bboxes per level
        self._starts: list[np.ndarray] = []   # child range starts per node
        self._ends: list[np.ndarray] = []
        if self.n_items == 0:
            self.perm = np.empty(0, dtype=np.int64)
            return
        cx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
        cy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5
        self.perm = _str_order(cx, cy, leaf_capacity)
        level = bboxes[self.perm]
        self._levels.append(level)
        while len(level) > 1:
            m = len(level)
            n_nodes = math.ceil(m / leaf_capacity)
            starts = np.arange(n_nodes, dtype=np.int64) * leaf_capacity
            ends = np.minimum(starts + leaf_capacity, m)
            nb = np.empty((n_nodes, 4), dtype=np.float64)
            nb[:, 0] = np.minimum.reduceat(level[:, 0], starts)
            nb[:, 1] = np.minimum.reduceat(level[:, 1], starts)
            nb[:, 2] = np.maximum.reduceat(level[:, 2], starts)
            nb[:, 3] = np.maximum.reduceat(level[:, 3], starts)
            self._starts.append(starts)
            self._ends.append(ends)
            self._levels.append(nb)
            level = nb

    # ------------------------------------------------------------------
    def to_state(self) -> dict:
        """Pure-array snapshot (broadcastable; zero-copy via the object
        store). Build once on the driver, ``from_state`` in every actor."""
        return {
            "item_bboxes": self.item_bboxes,
            "leaf_capacity": self.leaf_capacity,
            "perm": self.perm,
            "levels": self._levels,
            "starts": self._starts,
            "ends": self._ends,
        }

    @classmethod
    def from_state(cls, state: dict) -> "STRtree":
        tree = cls.__new__(cls)
        tree.item_bboxes = state["item_bboxes"]
        tree.n_items = len(state["item_bboxes"])
        tree.leaf_capacity = state["leaf_capacity"]
        tree.perm = state["perm"]
        tree._levels = state["levels"]
        tree._starts = state["starts"]
        tree._ends = state["ends"]
        return tree

    # ------------------------------------------------------------------
    def query_points(self, px: np.ndarray, py: np.ndarray):
        """Candidate pairs (point_index, item_index) whose item bbox contains
        the point. Level-synchronous vectorised descent."""
        if self.n_items == 0 or len(px) == 0:
            return (np.empty(0, dtype=np.int64),) * 2
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        # start at the root level
        pi = np.arange(len(px), dtype=np.int64)
        ni = np.zeros(len(px), dtype=np.int64)
        top = len(self._levels) - 1
        root = self._levels[top]
        m = ((px >= root[0, 0]) & (px <= root[0, 2])
             & (py >= root[0, 1]) & (py <= root[0, 3])) if top >= 0 else None
        pi, ni = pi[m], ni[m]
        for lvl in range(top, 0, -1):
            starts = self._starts[lvl - 1][ni]
            ends = self._ends[lvl - 1][ni]
            counts = ends - starts
            rep = np.repeat(np.arange(len(pi)), counts)
            child = _concat_ranges(starts, counts)
            boxes = self._levels[lvl - 1]
            cpx, cpy = px[pi[rep]], py[pi[rep]]
            hit = ((cpx >= boxes[child, 0]) & (cpx <= boxes[child, 2])
                   & (cpy >= boxes[child, 1]) & (cpy <= boxes[child, 3]))
            pi = pi[rep[hit]]
            ni = child[hit]
        return pi, self.perm[ni]

    def query_boxes(self, qboxes: np.ndarray):
        """Candidate pairs (query_index, item_index) with intersecting bboxes."""
        if self.n_items == 0 or len(qboxes) == 0:
            return (np.empty(0, dtype=np.int64),) * 2
        q = np.ascontiguousarray(qboxes, dtype=np.float64)
        qi = np.arange(len(q), dtype=np.int64)
        ni = np.zeros(len(q), dtype=np.int64)
        top = len(self._levels) - 1
        root = self._levels[top]
        m = _boxes_intersect(q, root[ni])
        qi, ni = qi[m], ni[m]
        for lvl in range(top, 0, -1):
            starts = self._starts[lvl - 1][ni]
            ends = self._ends[lvl - 1][ni]
            counts = ends - starts
            rep = np.repeat(np.arange(len(qi)), counts)
            child = _concat_ranges(starts, counts)
            boxes = self._levels[lvl - 1]
            hit = _boxes_intersect(q[qi[rep]], boxes[child])
            qi = qi[rep[hit]]
            ni = child[hit]
        return qi, self.perm[ni]

    def nearest(self, x: float, y: float, k: int = 1):
        """k nearest item indices to a point by bbox distance (best-first).

        Exact when items are points (bbox == point); for extended items this
        returns bbox-distance order and callers refine with true distance.
        """
        if self.n_items == 0:
            return []
        top = len(self._levels) - 1
        heap = [(0.0, top, 0)]
        out = []
        while heap and len(out) < k:
            d, lvl, idx = heapq.heappop(heap)
            if lvl == 0:
                out.append((d, int(self.perm[idx])))
                continue
            s, e = self._starts[lvl - 1][idx], self._ends[lvl - 1][idx]
            boxes = self._levels[lvl - 1]
            for c in range(s, e):
                heapq.heappush(heap, (_box_dist(boxes[c], x, y), lvl - 1, int(c)))
        return out


def _concat_ranges(starts: np.ndarray, counts: np.ndarray) -> np.ndarray:
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    off = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    return (np.arange(total, dtype=np.int64)
            - np.repeat(off[:-1], counts) + np.repeat(starts, counts))


def _boxes_intersect(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return ((a[:, 0] <= b[:, 2]) & (a[:, 2] >= b[:, 0])
            & (a[:, 1] <= b[:, 3]) & (a[:, 3] >= b[:, 1]))


def _box_dist(box: np.ndarray, x: float, y: float) -> float:
    dx = max(box[0] - x, 0.0, x - box[2])
    dy = max(box[1] - y, 0.0, y - box[3])
    return math.hypot(dx, dy)
