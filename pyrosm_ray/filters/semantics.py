"""Tag-filter truth tables: scalar oracle + vectorised Arrow evaluator.

Re-implements the reference's keep/exclude semantics
(/root/reference/pyrosm/data_filter.pyx:16-189,232-293) with two evaluators
that are tested against each other:

* :func:`element_keep` — the per-element scalar oracle (dict-of-tags in,
  bool out), mirroring ``record_should_be_kept`` / ``filter_osm_records``.
* :class:`TagBatchEvaluator` — the hot-path evaluator over an Arrow
  ``map<string,string>`` column: flattens the map child arrays once per batch
  and answers key-presence / dict-filter / compiled-filter questions with
  pyarrow.compute + numpy segment sums (no per-row Python).

Semantic invariants preserved bit-for-bit (SURVEY.md §2.2a):

* OR across ALL filter keys present on the element (not first-match).
* keep: retain iff some filter key matched; exclude: retain iff none matched.
* ``{key: True}`` (or True in the value list) matches any value of that key.
* Relation-member ways are always kept regardless of the value filter
  (handled by the caller via an ``always_keep`` mask).
* ``keep_all`` (custom_filter=None): retain any element carrying >=1 tag.
* Candidate gate: element must carry >=1 of ``osm_keys`` (or the compiled
  filter's positive keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import re

from pyrosm_ray.filters.compiler import CompiledFilter, TagTest, _pattern

# RE2 (the engine behind pc.match_substring_regex) rejects lookaround and
# backreferences; flags other than IGNORECASE are not forwarded either.
_RE2_UNSUPPORTED = re.compile(r"\(\?[=!<]|\\[1-9]")


def _re2_compatible(pattern: str, flags: int) -> bool:
    return (flags & ~re.IGNORECASE) == 0 \
        and _RE2_UNSUPPORTED.search(pattern) is None


def _normalize_dict_filter(data_filter: dict | None) -> dict | None:
    if data_filter is None or len(data_filter) == 0:
        return None
    return {k: ([True] if v is True else list(v)) for k, v in data_filter.items()}


def element_keep(tags, osm_keys, data_filter, filter_type: str,
                 keep_all: bool = False) -> bool:
    """Scalar oracle for one element's keep/drop decision.

    ``tags`` is the element's tag dict (may be empty), ``osm_keys`` the
    candidate layer keys, ``data_filter`` a plain dict / CompiledFilter / None,
    ``filter_type`` 'keep' or 'exclude'.
    """
    if tags is None:
        return False
    if keep_all:
        return len(tags) > 0
    if isinstance(osm_keys, str):
        osm_keys = [osm_keys]

    if isinstance(data_filter, CompiledFilter):
        if not any(k in tags for k in osm_keys):
            return False
        hit = data_filter.matches(tags)
        return hit if filter_type == "keep" else not hit

    if not any(k in tags for k in osm_keys):
        return False

    data_filter = _normalize_dict_filter(data_filter)
    if data_filter is None:
        # candidate gate passed, no value filter: keep-all-of-kind. Under
        # 'exclude' an empty filter excludes nothing -> keep as well (the way
        # path, data_filter.pyx:141-189); note the node/relation scalar path in
        # the reference returns False here — we follow the way path for both,
        # which matches actual reader usage (an empty exclude filter never
        # reaches the node path).
        return True

    matched = False
    for k, values in data_filter.items():
        if k in tags and (True in values or tags[k] in values):
            matched = True
            break
    return matched if filter_type == "keep" else not matched


class TagBatchEvaluator:
    """Vectorised tag queries over one batch's ``map<string,string>`` column."""

    def __init__(self, tags_col):
        if isinstance(tags_col, pa.ChunkedArray):
            tags_col = tags_col.combine_chunks()
        self._n = len(tags_col)
        if self._n == 0:
            self._off = np.zeros(1, dtype=np.int64)
            self._keys = pa.array([], pa.string())
            self._items = pa.array([], pa.string())
            return
        # MapArray child arrays are unsliced; offsets index into them directly.
        off = np.asarray(tags_col.offsets, dtype=np.int64)
        # Null map rows yield null offsets; treat them as empty (propagate the
        # previous offset forward).
        if np.any(np.asarray(tags_col.is_null())):
            off = np.asarray(
                pc.fill_null_backward(tags_col.offsets), dtype=np.int64
            )
        self._off = off
        self._keys = tags_col.keys
        self._items = tags_col.items

    # -- segment reductions -------------------------------------------------
    def _seg_count(self, flat_bool: np.ndarray) -> np.ndarray:
        """Per-element count of True in the flat child-array mask."""
        cs = np.zeros(len(flat_bool) + 1, dtype=np.int64)
        np.cumsum(flat_bool, out=cs[1:])
        return cs[self._off[1:]] - cs[self._off[:-1]]

    def _flat_np(self, arr) -> np.ndarray:
        return np.asarray(arr.to_numpy(zero_copy_only=False))

    # -- queries ------------------------------------------------------------
    def tag_count(self) -> np.ndarray:
        return self._off[1:] - self._off[:-1]

    def has_any_key(self, keys) -> np.ndarray:
        """True where the element carries at least one of ``keys``."""
        if self._n == 0:
            return np.zeros(0, dtype=bool)
        if not keys:
            return np.zeros(self._n, dtype=bool)
        flat = pc.is_in(self._keys, value_set=pa.array(list(keys), pa.string()))
        return self._seg_count(self._flat_np(pc.fill_null(flat, False))) > 0

    def key_matches_values(self, key: str, values) -> np.ndarray:
        """True where tag ``key`` is present and its value is in ``values``
        (or ``values`` contains True = any value)."""
        if self._n == 0:
            return np.zeros(0, dtype=bool)
        key_hit = pc.equal(self._keys, pa.scalar(key, pa.string()))
        if True in values:
            flat = key_hit
        else:
            strs = [v for v in values if isinstance(v, str)]
            val_hit = pc.is_in(self._items, value_set=pa.array(strs, pa.string()))
            flat = pc.and_kleene(key_hit, val_hit)
        return self._seg_count(self._flat_np(pc.fill_null(flat, False))) > 0

    def dict_filter_matches(self, data_filter: dict) -> np.ndarray:
        """OR across all filter keys of :meth:`key_matches_values`."""
        data_filter = _normalize_dict_filter(data_filter)
        out = np.zeros(self._n, dtype=bool)
        if data_filter is None:
            return out
        for k, values in data_filter.items():
            out |= self.key_matches_values(k, values)
        return out

    def _test_mask(self, test: TagTest) -> np.ndarray:
        key_present = self.has_any_key([test.key])
        if test.op == "exists":
            return key_present
        if test.op == "nexists":
            return ~key_present
        if test.op in ("eq", "ne"):
            hit = self.key_matches_values(test.key, [test.value])
            return hit if test.op == "eq" else ~hit
        # regex / nregex over the values of this key
        key_hit = pc.equal(self._keys, pa.scalar(test.key, pa.string()))
        if _re2_compatible(test.value, test.flags):
            rx = pc.match_substring_regex(
                self._items, test.value,
                ignore_case=bool(test.flags & 2),  # re.IGNORECASE == 2
            )
            flat = pc.and_kleene(key_hit, rx)
            flat_np = self._flat_np(pc.fill_null(flat, False))
        else:
            # flags/syntax beyond RE2 (MULTILINE/DOTALL, lookaround,
            # backrefs): evaluate with Python re so the hot path agrees
            # with the scalar oracle; only values carrying the key run it
            key_np = self._flat_np(pc.fill_null(key_hit, False))
            items_np = self._flat_np(self._items)
            pat = _pattern(test.value, test.flags)
            flat_np = np.zeros(len(items_np), dtype=bool)
            for i in np.flatnonzero(key_np):
                v = items_np[i]
                flat_np[i] = v is not None and pat.search(str(v)) is not None
        hit = self._seg_count(flat_np) > 0
        return hit if test.op == "regex" else ~hit

    def compiled_filter_matches(self, cf: CompiledFilter) -> np.ndarray:
        out = np.zeros(self._n, dtype=bool)
        for group in cf.groups:
            g = np.ones(self._n, dtype=bool)
            for test in group:
                g &= self._test_mask(test)
                if not g.any():
                    break
            out |= g
        return out

    def keep_mask(self, osm_keys, data_filter, filter_type: str,
                  keep_all: bool = False,
                  always_keep: np.ndarray | None = None) -> np.ndarray:
        """Full keep/drop decision for the batch (vector analogue of
        :func:`element_keep`), with the relation-member ``always_keep``
        override applied last."""
        if keep_all:
            mask = self.tag_count() > 0
        else:
            if isinstance(osm_keys, str):
                osm_keys = [osm_keys]
            mask = self.has_any_key(osm_keys)
            if isinstance(data_filter, CompiledFilter):
                hit = self.compiled_filter_matches(cf=data_filter)
                mask &= hit if filter_type == "keep" else ~hit
            elif data_filter is not None and len(data_filter) > 0:
                hit = self.dict_filter_matches(data_filter)
                mask &= hit if filter_type == "keep" else ~hit
        if always_keep is not None:
            mask = mask | always_keep
        return mask
