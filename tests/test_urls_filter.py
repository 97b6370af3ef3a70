"""Host blocklist filter + domain-reputation floor (stages/urls.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from pyrosm_ray.stages import urls as U

URLS = [
    "https://good.example/a",
    "https://bad.example/b",
    "HTTPS://BAD.example:443/c",     # mixed case + default port
    "https://good.example/d",
    "not a url at all",              # host '' — never blocked
    "https://other.example/e",
]


def _pages():
    return pa.table({
        "url": pa.array(URLS, pa.string()),
        "pid": pa.array(range(len(URLS)), pa.int64()),
    })


def test_host_filter_broadcast_route(ray_session):
    out = U.host_filter(rd.from_arrow(_pages()), ["bad.example"]) \
        .to_pandas().sort_values("pid")
    assert out["pid"].tolist() == [0, 3, 4, 5]
    assert list(out.columns) == ["url", "pid"]  # helper column dropped


def test_host_filter_distributed_route_parity(ray_session):
    blk_ds = rd.from_arrow(pa.table({"host": ["BAD.example"]}))
    out = U.host_filter(rd.from_arrow(_pages()), blk_ds) \
        .to_pandas().sort_values("pid")
    assert out["pid"].tolist() == [0, 3, 4, 5]
    assert list(out.columns) == ["url", "pid"]


def test_extract_host_lowercases_and_handles_non_urls(ray_session):
    out = rd.from_arrow(_pages()).map_batches(
        lambda b: U.extract_host_batch(b), batch_format="pyarrow") \
        .to_pandas().sort_values("pid")
    assert out["host"].tolist() == ["good.example", "bad.example",
                                    "bad.example", "good.example", "",
                                    "other.example"]


def test_host_reputation_floor(ray_session):
    # hosts: a -> 10+10=20 tokens, b -> 6, c -> 2. median over
    # [2, 6, 20] = 6 -> hosts a and b survive.
    t = pa.table({
        "url": pa.array([
            "https://a.example/1", "https://a.example/2",
            "https://b.example/1", "https://c.example/1"]),
        "text": pa.array([
            " ".join(["w"] * 10), " ".join(["w"] * 10),
            " ".join(["w"] * 6), "w w"]),
    })
    out = U.host_reputation_filter(rd.from_arrow(t)).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert out["host"].tolist() == ["a.example", "a.example", "b.example"]
    assert out["host_tokens"].tolist() == [20, 20, 6]
