"""Filter truth tables: scalar oracle semantics + vectorised equivalence.

Cases mirror the reference behaviors documented in SURVEY.md §2.2a
(/root/reference/pyrosm/data_filter.pyx:16-189,232-293 and
pyrosm/filter_compiler.py)."""

import re

import numpy as np
import pyarrow as pa
import pytest

from pyrosm_ray.filters.compiler import (
    CompiledFilter, TagTest, compile_custom_filter, is_advanced_filter,
    parse_bracket_filter,
)
from pyrosm_ray.filters.semantics import TagBatchEvaluator, element_keep


def tags_array(dicts):
    return pa.array(
        [None if d is None else list(d.items()) for d in dicts],
        type=pa.map_(pa.string(), pa.string()),
    )


# ---------------------------------------------------------------------------
# scalar oracle
# ---------------------------------------------------------------------------

def test_keep_matches_any_value():
    f = {"building": ["residential"]}
    assert element_keep({"building": "residential"}, ["building"], f, "keep")
    assert not element_keep({"building": "retail"}, ["building"], f, "keep")
    assert not element_keep({"landuse": "grass"}, ["building"], f, "keep")


def test_true_matches_any_value():
    f = {"building": True}
    assert element_keep({"building": "whatever"}, ["building"], f, "keep")
    f2 = {"building": [True]}
    assert element_keep({"building": "x"}, ["building"], f2, "keep")


def test_exclude_keeps_nonmatching():
    # walking preset shape: exclude highway values
    f = {"highway": ["motorway"], "foot": ["no"]}
    assert element_keep({"highway": "residential"}, ["highway"], f, "exclude")
    assert not element_keep({"highway": "motorway"}, ["highway"], f, "exclude")
    # secondary-key exclusion must fire even when primary key doesn't match
    # (reference issues #108/#112: OR across ALL filter keys)
    assert not element_keep(
        {"highway": "residential", "foot": "no"}, ["highway"], f, "exclude")


def test_candidate_gate():
    f = {"area": ["yes"]}
    # element lacking every osm_key is dropped regardless of filter
    assert not element_keep({"area": "yes"}, ["highway"], f, "exclude")
    assert not element_keep({"name": "x"}, ["highway"], None, "keep")


def test_keep_all_semantics():
    assert element_keep({"anything": "v"}, ["highway"], None, "keep", keep_all=True)
    assert not element_keep({}, ["highway"], None, "keep", keep_all=True)
    assert not element_keep(None, ["highway"], None, "keep", keep_all=True)


def test_empty_filter_keeps_all_of_kind():
    assert element_keep({"highway": "service"}, ["highway"], {}, "keep")
    assert element_keep({"highway": "service"}, ["highway"], None, "keep")


def test_multi_osm_keys_poi_style():
    keys = ["amenity", "shop", "tourism"]
    f = {"amenity": True, "shop": True, "tourism": True}
    assert element_keep({"shop": "bakery"}, keys, f, "keep")
    assert not element_keep({"building": "yes"}, keys, f, "keep")


# ---------------------------------------------------------------------------
# advanced filters
# ---------------------------------------------------------------------------

def test_bracket_parse_and_semantics():
    cf = compile_custom_filter('["highway"~"cycleway"]["bicycle"!="no"]')
    assert isinstance(cf, CompiledFilter)
    assert cf.matches({"highway": "cycleway"})          # absent bicycle -> ne passes
    assert not cf.matches({"highway": "cycleway", "bicycle": "no"})
    assert not cf.matches({"highway": "residential"})
    assert cf.positive_keys == ["highway"]


def test_bracket_or_of_strings():
    cf = compile_custom_filter(['["highway"="path"]', '["route"]'])
    assert cf.matches({"highway": "path"})
    assert cf.matches({"route": "bicycle"})
    assert not cf.matches({"highway": "track"})


def test_bracket_regex_flag_and_negation():
    cf = compile_custom_filter('["ref"~"i[ -]?20",i]')
    assert cf.matches({"ref": "I-20"})
    cf2 = compile_custom_filter('["highway"]["access"!~"priv"]')
    assert cf2.matches({"highway": "x"})
    assert not cf2.matches({"highway": "x", "access": "private"})


def test_negated_key_bracket():
    cf = compile_custom_filter('["highway"][!"tunnel"]')
    assert cf.matches({"highway": "a"})
    assert not cf.matches({"highway": "a", "tunnel": "yes"})


def test_only_negative_rejected():
    with pytest.raises(ValueError):
        parse_bracket_filter('["highway"!="x"]')


def test_regex_dict_lowering():
    f = {"ref": [re.compile(r"I[ -]?20")], "highway": ["motorway"]}
    assert is_advanced_filter(f)
    cf = compile_custom_filter(f)
    assert cf.matches({"ref": "I 20"})
    assert cf.matches({"highway": "motorway"})
    assert not cf.matches({"highway": "service"})


def test_plain_dict_stays_dict():
    f = {"building": True}
    assert compile_custom_filter(f) is f
    assert not is_advanced_filter(f)


def test_or_require():
    cf = CompiledFilter(((TagTest("landuse", "eq", "grass"),),))
    cf2 = cf.or_require("building")
    assert cf2.matches({"building": "yes"})
    assert cf2.or_require("building") is cf2


# ---------------------------------------------------------------------------
# vectorised evaluator == scalar oracle (randomised differential test)
# ---------------------------------------------------------------------------

def random_tag_dicts(rng, n):
    keys = ["highway", "building", "foot", "area", "service", "name", "ref"]
    vals = ["yes", "no", "motorway", "residential", "private", "I-20", "x"]
    out = []
    for _ in range(n):
        k = rng.integers(0, 4)
        d = {keys[i]: vals[rng.integers(0, len(vals))]
             for i in rng.choice(len(keys), size=k, replace=False)}
        out.append(d)
    out[0] = {}
    if n > 1:
        out[1] = None
    return out


@pytest.mark.parametrize("filter_type", ["keep", "exclude"])
@pytest.mark.parametrize("data_filter", [
    None,
    {},
    {"highway": ["motorway", "residential"]},
    {"highway": True},
    {"highway": ["motorway"], "foot": ["no"], "service": ["private"]},
    compile_custom_filter('["highway"~"motor|resi"]["foot"!="no"]'),
    compile_custom_filter(['["building"]', '["highway"="residential"]']),
])
def test_vector_matches_scalar(filter_type, data_filter):
    rng = np.random.default_rng(7)
    dicts = random_tag_dicts(rng, 300)
    osm_keys = (data_filter.positive_keys
                if isinstance(data_filter, CompiledFilter)
                else ["highway", "building"])
    ev = TagBatchEvaluator(tags_array(dicts))
    for keep_all in (False, True):
        got = ev.keep_mask(osm_keys, data_filter, filter_type, keep_all=keep_all)
        want = np.array([
            element_keep({} if d is None else d, osm_keys, data_filter,
                         filter_type, keep_all) and d is not None
            for d in dicts
        ])
        np.testing.assert_array_equal(got, want)


def test_always_keep_override():
    dicts = [{"highway": "motorway"}, {}, {"building": "yes"}]
    ev = TagBatchEvaluator(tags_array(dicts))
    always = np.array([False, True, False])
    mask = ev.keep_mask(["highway"], {"highway": ["motorway"]}, "exclude",
                        always_keep=always)
    # motorway excluded, untagged way kept via relation-member override,
    # building dropped by candidate gate
    np.testing.assert_array_equal(mask, [False, True, False])


def test_reference_advanced_filter_edge_cases():
    """Pins the reference's advanced-filter edge semantics
    (tests/test_advanced_filter.py): quote-aware values, whitespace
    between brackets, the ,i flag, the invalid-filter matrix, idempotent
    compile, pickle roundtrip."""
    import pickle

    import pytest
    f = compile_custom_filter('["name"~"a]b"]')  # bracket inside value
    assert f.matches({"name": "xa]bx"}) and not f.matches({"name": "ab"})
    f = compile_custom_filter('["highway"~"path"]  ["bicycle"~"designated"]')
    assert f.matches({"highway": "path", "bicycle": "designated"})
    assert not f.matches({"highway": "path"})
    f = compile_custom_filter('["name"~"oxford",i]')
    assert f.matches({"name": "OXFORD Street"})
    assert not compile_custom_filter('["name"~"oxford"]').matches(
        {"name": "OXFORD Street"})
    for bad in ('["highway"', '["highway"="a"', '[~"^addr:.*$"~"."]',
                '["a"!="b"]', '["a"#"b"]', '["a"="b",x]', '["a"="b",i]'):
        with pytest.raises(ValueError):
            compile_custom_filter(bad)
    f = compile_custom_filter('["a"="x"]')
    assert compile_custom_filter(f) is f
    g = pickle.loads(pickle.dumps(f))
    assert g.matches({"a": "x"}) and not g.matches({"a": "y"})
