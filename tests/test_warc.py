"""WARC source/sink: round-trip byte identity, range-split ownership,
foreign-record filtering, resync robustness (ISO 28500 layout; the
Common-Crawl member-per-record gz split contract)."""

import gzip
import os

import pyarrow as pa
import pytest
import ray.data as rd

from pyrosm_ray.sources.warc import (encode_record, read_warc, write_warc)


def _docs(n=40, big_every=0):
    """Deterministic corpus; payloads carry CRLFs, fake record headers and
    gzip magic bytes so resync/framing can't cheat."""
    urls, texts = [], []
    for i in range(n):
        urls.append(f"https://example.org/p/{i:04d}")
        body = (f"doc {i} body\r\n\r\nWARC/1.0\r\n"
                f"Content-Length: 999\r\n\r\n\x1f\x8b\x08fake "
                + "x" * (50 + 37 * (i % 7)))
        if big_every and i % big_every == 0:
            body += "Y" * 20000
        texts.append(body)
    return pa.table({"url": pa.array(urls),
                     "payload": pa.array(texts, pa.string())})


def _expected(t):
    return {u: p.encode() for u, p in zip(t["url"].to_pylist(),
                                          t["payload"].to_pylist())}


def _got(ds):
    df = ds.to_pandas()
    return dict(zip(df["url"], (bytes(p) for p in df["payload"])))


@pytest.mark.parametrize("compress", [True, False])
def test_warc_roundtrip_byte_identity(ray_session, tmp_path, compress):
    t = _docs()
    out = str(tmp_path / ("gz" if compress else "plain"))
    man = write_warc(rd.from_arrow(t).repartition(5), out,
                     compress=compress)
    assert int(man["n_records"].to_pandas().sum()) == t.num_rows
    assert len(man) == 5  # one shard per block, no driver funnel
    got = _got(read_warc(out))
    assert got == _expected(t)


def test_warc_gz_range_split_each_record_once(ray_session, tmp_path):
    """Adversarial split grid: ranges far smaller than one member, then
    smaller than the file — every record owned by exactly one task."""
    t = _docs(n=25, big_every=6)
    out = str(tmp_path / "w")
    write_warc(rd.from_arrow(t).repartition(2), out)
    for target in (200, 1 << 12, 1 << 20):
        ds = read_warc(out, target_bytes=target)
        df = ds.to_pandas()
        assert len(df) == t.num_rows, target
        assert df["url"].is_unique
        assert _got(read_warc(out, target_bytes=target)) == _expected(t)


def test_warc_response_records_strip_http(ray_session, tmp_path):
    t = _docs(n=8)
    out = str(tmp_path / "resp")
    write_warc(rd.from_arrow(t), out, warc_type="response")
    ds = read_warc(out, target_bytes=500)
    got = _got(ds)
    assert got == _expected(t)
    df = ds.to_pandas()
    assert set(df["warc_type"]) == {"response"}
    assert all(ct.startswith("application/http")
               for ct in df["content_type"])


def test_warc_foreign_record_types_filtered(ray_session, tmp_path):
    """Hand-built file in the real CC shape: warcinfo + request/response
    pairs. Default read keeps response/resource only; record_types=None
    returns everything."""
    recs = [encode_record("", "2026-01-01T00:00:00Z",
                          b"software: test\r\n", "warcinfo",
                          "application/warc-fields")]
    for i in range(5):
        u = f"https://example.org/{i}"
        recs.append(encode_record(u, "2026-01-01T00:00:00Z",
                                  b"GET / HTTP/1.1\r\n\r\n", "request",
                                  "application/http; msgtype=request"))
        recs.append(encode_record(u, "2026-01-01T00:00:00Z",
                                  f"page {i}".encode(), "response"))
    p = tmp_path / "cc.warc.gz"
    with open(p, "wb") as f:
        for r in recs:
            f.write(gzip.compress(r, mtime=0))
    df = read_warc(str(p), target_bytes=300).to_pandas()
    assert len(df) == 5
    assert {bytes(x).decode() for x in df["payload"]} == \
        {f"page {i}" for i in range(5)}
    all_df = read_warc(str(p), record_types=None,
                       target_bytes=300).to_pandas()
    assert sorted(all_df["warc_type"].value_counts().to_dict().items()) \
        == [("request", 5), ("response", 5), ("warcinfo", 1)]


def test_warc_deterministic_shards_and_resume_names(ray_session,
                                                    tmp_path):
    """Same blocking -> same shard names and bytes (the resume contract)."""
    t = _docs(n=12)
    out = str(tmp_path / "det")
    m1 = write_warc(rd.from_arrow(t).repartition(3), out)
    sizes1 = {s: os.path.getsize(s) for s in m1["shard"].to_pylist()}
    m2 = write_warc(rd.from_arrow(t).repartition(3), out)
    sizes2 = {s: os.path.getsize(s) for s in m2["shard"].to_pylist()}
    assert sizes1 == sizes2
    blobs = {s: open(s, "rb").read() for s in sizes1}
    m3 = write_warc(rd.from_arrow(t).repartition(3), out)
    for s in m3["shard"].to_pylist():
        assert open(s, "rb").read() == blobs[s]


def test_warc_binary_payload_passthrough(ray_session, tmp_path):
    """Arbitrary binary payloads (all byte values, embedded terminators)
    survive byte-identical through gz write + split read."""
    payloads = [bytes(range(256)) * 3,
                b"\r\n\r\nWARC/1.0\r\n" * 10,
                b"", b"\x1f\x8b\x08" * 100]
    t = pa.table({
        "url": pa.array([f"u{i}" for i in range(len(payloads))]),
        "payload": pa.array(payloads, pa.large_binary()),
    })
    out = str(tmp_path / "bin")
    write_warc(rd.from_arrow(t), out, content_type="application/octet"
               "-stream")
    got = _got(read_warc(out, target_bytes=128))
    assert got == {u: p for u, p in zip(t["url"].to_pylist(), payloads)}


def test_warc_resume_skips_existing_shards(ray_session, tmp_path):
    """resume=True: present shards are not re-encoded (bytes untouched,
    manifest flags them); a deleted shard is the only one rewritten."""
    t = _docs(n=12)
    out = str(tmp_path / "res")
    m1 = write_warc(rd.from_arrow(t).repartition(3), out)
    shards = sorted(m1["shard"].to_pylist())
    victim = shards[0]
    os.remove(victim)
    mtimes = {s: os.path.getmtime(s) for s in shards[1:]}
    m2 = write_warc(rd.from_arrow(t).repartition(3), out, resume=True)
    flags = dict(zip(m2["shard"].to_pylist(), m2["resumed"].to_pylist()))
    assert flags[victim] is False          # rewritten
    assert all(flags[s] for s in shards[1:])  # skipped
    assert all(os.path.getmtime(s) == mtimes[s] for s in shards[1:])
    assert _got(read_warc(out)) == _expected(t)
