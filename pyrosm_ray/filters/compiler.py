"""Advanced tag-filter compiler: regex dicts and Overpass bracket strings.

Re-implements (from scratch, for the Ray engine) the semantics of the
reference's advanced filters (/root/reference/pyrosm/filter_compiler.py:37-331):

* A ``custom_filter`` dict whose values contain compiled regex patterns, or an
  Overpass-style bracket string such as ``'["highway"~"cycleway"]'`` (a list of
  strings is an OR), lowers into a disjunctive-normal-form predicate: an OR of
  AND-groups of single tag tests.
* A tag test is one of ``eq / ne / regex / nregex / exists / nexists``.
  Negative tests (``ne``/``nregex``/``nexists``) are satisfied when the key is
  absent (Overpass semantics: ``["bicycle"!="no"]`` keeps untagged ways).
* ``positive_keys`` (keys of eq/regex/exists tests) form the candidate gate:
  an element carrying none of them cannot match any AND-group.

Everything here is plain picklable Python, so the same object is shipped into
Ray tasks / actors unchanged.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

_POSITIVE_OPS = frozenset({"eq", "regex", "exists"})

# Operator token -> internal op name, longest tokens first so '!=' wins over '='.
_OP_TOKENS = (("!=", "ne"), ("!~", "nregex"), ("=", "eq"), ("~", "regex"))


@lru_cache(maxsize=None)
def _pattern(source: str, flags: int) -> re.Pattern:
    """Per-process compiled-regex cache (survives pickling of TagTest)."""
    return re.compile(source, flags)


@dataclass(frozen=True)
class TagTest:
    """One tag condition, e.g. ``highway = residential`` or ``ref ~ 'I[ -]?20'``.

    Stores only the regex *source* + int flags (never a compiled object) so the
    test pickles cleanly into Ray workers.
    """

    key: str
    op: str  # eq | ne | regex | nregex | exists | nexists
    value: str = ""
    flags: int = 0

    @property
    def is_positive(self) -> bool:
        return self.op in _POSITIVE_OPS

    def matches(self, tags) -> bool:
        op = self.op
        if op == "exists":
            return self.key in tags
        if op == "nexists":
            return self.key not in tags
        if self.key not in tags:
            # key absent: negative tests pass, positive tests fail
            return op in ("ne", "nregex")
        tag_value = tags[self.key]
        if op == "eq":
            return tag_value == self.value
        if op == "ne":
            return tag_value != self.value
        hit = _pattern(self.value, self.flags).search(str(tag_value)) is not None
        return hit if op == "regex" else not hit


@dataclass(frozen=True)
class CompiledFilter:
    """OR of AND-groups of :class:`TagTest` (DNF). Matches when any group holds."""

    groups: tuple = ()

    def matches(self, tags) -> bool:
        for group in self.groups:
            if all(test.matches(tags) for test in group):
                return True
        return False

    @property
    def positive_keys(self) -> list[str]:
        """Candidate-gate keys (the reference's ``osm_keys`` for advanced filters)."""
        return sorted({t.key for g in self.groups for t in g if t.is_positive})

    def keys(self) -> list[str]:
        return sorted({t.key for g in self.groups for t in g})

    def or_require(self, key: str) -> "CompiledFilter":
        """Also keep elements carrying ``key`` (adds an ``exists`` OR-group).

        No-op when the key is already referenced — mirrors how the reference's
        layer modules inject their default layer key.
        """
        if key in self.keys():
            return self
        return CompiledFilter(self.groups + ((TagTest(key, "exists"),),))


# ---------------------------------------------------------------------------
# Overpass bracket-string parsing
# ---------------------------------------------------------------------------


def _take_quoted(text: str) -> tuple[str, str]:
    if not text or text[0] not in "\"'":
        raise ValueError(f"expected a quoted token in filter fragment: {text!r}")
    q = text[0]
    end = text.find(q, 1)
    if end < 0:
        raise ValueError(f"unterminated quote in filter fragment: {text!r}")
    return text[1:end], text[end + 1:]


def _bracket_interiors(spec: str) -> list[str]:
    """Split ``'["a"="b"]["c"]'`` into interiors, respecting quoted ``]``."""
    out: list[str] = []
    i, n = 0, len(spec)
    while i < n:
        c = spec[i]
        if c.isspace():
            i += 1
            continue
        if c != "[":
            raise ValueError(f"expected '[' at offset {i} of {spec!r}")
        j, quote = i + 1, None
        while j < n:
            cj = spec[j]
            if quote is not None:
                if cj == quote:
                    quote = None
            elif cj in "\"'":
                quote = cj
            elif cj == "]":
                break
            j += 1
        if j >= n:
            raise ValueError(f"unbalanced '[' in {spec!r}")
        out.append(spec[i + 1: j])
        i = j + 1
    return out


def _parse_one_bracket(interior: str) -> TagTest:
    text = interior.strip()
    if not text:
        raise ValueError("empty '[]' bracket in filter string")
    if text.startswith("!"):  # [!"key"] -> key must be absent
        key, rest = _take_quoted(text[1:].strip())
        if not key or rest.strip():
            raise ValueError(f"malformed negated-key bracket: {interior!r}")
        return TagTest(key, "nexists")
    if text.startswith("~"):
        raise ValueError("key-regex brackets (e.g. [~\"^addr\"~\".\"]) are not supported")
    key, rest = _take_quoted(text)
    if not key:
        raise ValueError(f"empty key in bracket: {interior!r}")
    rest = rest.strip()
    if not rest:  # ["key"] -> exists
        return TagTest(key, "exists")
    for token, op in _OP_TOKENS:
        if rest.startswith(token):
            rest = rest[len(token):].strip()
            break
    else:
        raise ValueError(f"expected one of = != ~ !~ in bracket: {interior!r}")
    value, rest = _take_quoted(rest)
    rest = rest.strip()
    flags = 0
    if rest:
        if rest.replace(" ", "") == ",i" and op in ("regex", "nregex"):
            flags = re.IGNORECASE
        else:
            raise ValueError(f"trailing text after value in bracket: {interior!r}")
    return TagTest(key, op, value, flags)


def parse_bracket_filter(spec) -> tuple:
    """One string -> one AND-group; a list of strings -> OR of groups."""
    specs = [spec] if isinstance(spec, str) else list(spec)
    groups = []
    for s in specs:
        if not isinstance(s, str):
            raise ValueError(f"bracket filter entries must be strings, got {s!r}")
        tests = tuple(_parse_one_bracket(b) for b in _bracket_interiors(s))
        if not tests:
            raise ValueError(f"no brackets in filter string {s!r}")
        if not any(t.is_positive for t in tests):
            raise ValueError(
                f"filter string {s!r} has only negative tests; add a positive "
                f"test (=, ~ or a bare key) so the candidate gate can select elements"
            )
        groups.append(tests)
    return tuple(groups)


# ---------------------------------------------------------------------------
# Dict lowering (regex dicts)
# ---------------------------------------------------------------------------


def _dict_to_groups(custom_filter: dict) -> tuple:
    groups = []
    for key, values in custom_filter.items():
        if values is True:
            groups.append((TagTest(key, "exists"),))
            continue
        if isinstance(values, re.Pattern):
            groups.append((TagTest(key, "regex", values.pattern, values.flags),))
            continue
        if not isinstance(values, list):
            raise ValueError(f"filter value for {key!r} must be a list / True / regex")
        for v in values:
            if v is True:
                groups.append((TagTest(key, "exists"),))
            elif isinstance(v, re.Pattern):
                groups.append((TagTest(key, "regex", v.pattern, v.flags),))
            elif isinstance(v, str):
                groups.append((TagTest(key, "eq", v),))
            else:
                raise ValueError(f"filter value {v!r} for {key!r} must be str/regex/True")
    return tuple(groups)


def _dict_has_regex(custom_filter: dict) -> bool:
    return any(
        isinstance(v, re.Pattern)
        or (isinstance(v, list) and any(isinstance(x, re.Pattern) for x in v))
        for v in custom_filter.values()
    )


def is_advanced_filter(custom_filter) -> bool:
    if isinstance(custom_filter, (str, list, tuple, CompiledFilter)):
        return True
    if isinstance(custom_filter, dict):
        return _dict_has_regex(custom_filter)
    return False


def compile_custom_filter(custom_filter):
    """Normalise any user filter form; idempotent.

    ``None`` and :class:`CompiledFilter` pass through; bracket strings/lists and
    regex dicts compile to :class:`CompiledFilter`; a plain dict stays a dict
    (the fast vectorisable path).
    """
    if custom_filter is None or isinstance(custom_filter, CompiledFilter):
        return custom_filter
    if isinstance(custom_filter, (str, list, tuple)):
        return CompiledFilter(parse_bracket_filter(custom_filter))
    if isinstance(custom_filter, dict):
        if _dict_has_regex(custom_filter):
            return CompiledFilter(_dict_to_groups(custom_filter))
        return custom_filter
    raise ValueError(
        f"custom_filter must be dict / bracket string / list of strings, "
        f"got {type(custom_filter).__name__}"
    )
