"""OSM PBF source: from-scratch wire decoder + Ray Data on-ramp (S1-S5,
M1-M5).

Implements the PUBLIC OSM PBF file format (fileformat.proto /
osmformat.proto wire layout, https://wiki.openstreetmap.org/wiki/PBF_Format)
with a hand-rolled protobuf wire parser — no generated message classes, no
protobuf runtime. Packed integer fields (the bulk of the bytes: dense-node
ids/lats/lons, way refs, relation memids) decode with a fully vectorised
numpy varint kernel; only the per-element field headers walk a Python loop.

Composition into Ray Data is index-then-fan-out:

* :func:`scan_blob_index` (S1/S2) reads ONLY the 4-byte length prefixes and
  BlobHeaders — one driver pass of a few KB per blob — and yields
  (offset, size, type) descriptors.
* :func:`read_pbf` turns the descriptor list into a Dataset and decodes
  blobs inside ``map_batches`` tasks (zlib + wire parse run distributed,
  S3/M1-M5); each task seeks and reads its own byte range, so the file can
  live on any shared mount.
* :func:`pbf_to_parquet` is the on-ramp to the rest of the engine: ONE
  streaming pass writes the three element tables in the engine's Parquet
  schema (one fragment per blob — resumable, deterministic names), after
  which :class:`pyrosm_ray.pipelines.layers.OSM` works unchanged.

Reference behaviour anchor (decoder parity, NOT code): the reference parses
the same format via google.protobuf (pyrosm/pbfreader.pyx:193-455); its
bundled ``test.osm.pbf``/``Helsinki.osm.pbf`` fixtures and published counts
are used as golden inputs in tests/test_pbf.py.
"""

from __future__ import annotations

import os
import zlib

import numpy as np
import pyarrow as pa

NANO = 1e-9
_MEMBER_TYPES = np.array(["node", "way", "relation"], dtype=object)

TAGS_T = pa.map_(pa.string(), pa.string())
MEMBERS_T = pa.list_(pa.struct([("member_id", pa.int64()),
                                ("member_type", pa.string()),
                                ("member_role", pa.string())]))


# ---------------------------------------------------------------------------
# varint / wire primitives
# ---------------------------------------------------------------------------

def decode_packed_varints(data: bytes) -> np.ndarray:
    """Vectorised decode of concatenated base-128 varints -> uint64 array.

    Continuation bits mark varint boundaries; every byte's 7-bit payload is
    scatter-added at its shift position (shifts wrap mod 2^64, matching
    two's-complement protobuf semantics)."""
    b = np.frombuffer(data, dtype=np.uint8)
    if not len(b):
        return np.empty(0, dtype=np.uint64)
    ends = (b & 0x80) == 0
    n = int(ends.sum())
    vidx = np.zeros(len(b), dtype=np.int64)
    np.cumsum(ends[:-1], out=vidx[1:])
    starts = np.zeros(n, dtype=np.int64)
    starts[1:] = np.flatnonzero(ends)[:-1] + 1
    shift = (np.arange(len(b), dtype=np.int64) - starts[vidx]) * 7
    contrib = (b & 0x7F).astype(np.uint64) << np.minimum(
        shift, 63).astype(np.uint64)
    contrib[shift > 63] = 0  # sign-extension bytes of 10-byte varints
    out = np.zeros(n, dtype=np.uint64)
    np.add.at(out, vidx, contrib)
    return out


def unzigzag(v: np.ndarray) -> np.ndarray:
    """Packed sint64 -> int64 (zigzag decode)."""
    v = v.astype(np.uint64)
    return ((v >> np.uint64(1)) ^ (~(v & np.uint64(1)) + np.uint64(1))) \
        .view(np.int64)


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        out |= (byte & 0x7F) << shift
        if byte < 0x80:
            return out & 0xFFFFFFFFFFFFFFFF, pos
        shift += 7


def _fields(buf: memoryview, start: int = 0, end: int | None = None):
    """Iterate a message's (field_number, value) pairs.

    Varint fields yield ints; length-delimited fields yield memoryviews;
    fixed32/64 are skipped (unused by the OSM schema)."""
    pos = start
    end = len(buf) if end is None else end
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
            yield field, val
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:  # pragma: no cover - groups are not used by the OSM schema
            raise ValueError(f"unsupported wire type {wt}")


# ---------------------------------------------------------------------------
# blob framing (S1-S3)
# ---------------------------------------------------------------------------

def scan_blob_index(path: str) -> list[dict]:
    """Blob index: [{offset, size, type}] reading only headers (S1/S2)."""
    out = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = int.from_bytes(raw, "big")
            header = memoryview(f.read(hlen))
            btype, dsize = "", 0
            for field, val in _fields(header):
                if field == 1:
                    btype = bytes(val).decode()
                elif field == 3:
                    dsize = val
            out.append({"offset": f.tell(), "size": dsize, "type": btype})
            f.seek(dsize, os.SEEK_CUR)
    return out


def read_blob_data(path: str, offset: int, size: int) -> bytes:
    """Read + decompress one Blob's payload (S3)."""
    with open(path, "rb") as f:
        f.seek(offset)
        blob = memoryview(f.read(size))
    raw = None
    seen: list[str] = []
    for field, val in _fields(blob):
        if field == 1:          # uncompressed
            raw = bytes(val)
        elif field == 3:        # zlib_data
            raw = zlib.decompress(bytes(val))
        elif field == 4:        # lzma_data (spec-legal; stdlib codec)
            import lzma
            raw = lzma.decompress(bytes(val))
        elif field == 6:        # lz4_data (block format, needs lz4 pkg)
            seen.append("lz4")
            try:
                import lz4.block
            except ImportError:
                continue
            raw = lz4.block.decompress(bytes(val))
        elif field == 7:        # zstd_data (needs zstandard pkg)
            seen.append("zstd")
            try:
                import zstandard
            except ImportError:
                continue
            raw = zstandard.ZstdDecompressor().decompress(bytes(val))
    if raw is None:
        if seen:
            raise ValueError(
                f"Blob uses {'/'.join(seen)} compression but the codec "
                f"package is not installed")
        raise ValueError("Blob carries no raw/zlib/lzma payload")
    return raw


def parse_header_block(data: bytes) -> dict:
    """OSMHeader: bbox (nanodegrees) + feature strings (S5)."""
    out = {"bbox": None, "required_features": [], "optional_features": []}
    for field, val in _fields(memoryview(data)):
        if field == 1:  # HeaderBBox {1:left 2:right 3:top 4:bottom} sint64
            bb = {}
            for f2, v2 in _fields(val):
                bb[f2] = unzigzag(np.array([v2], dtype=np.uint64))[0]
            out["bbox"] = (bb.get(1, 0) * NANO, bb.get(4, 0) * NANO,
                           bb.get(2, 0) * NANO, bb.get(3, 0) * NANO)
        elif field == 4:
            out["required_features"].append(bytes(val).decode())
        elif field == 5:
            out["optional_features"].append(bytes(val).decode())
    return out


# ---------------------------------------------------------------------------
# PrimitiveBlock decode (S4 + M1-M5)
# ---------------------------------------------------------------------------

def _decode_stringtable(val: memoryview) -> np.ndarray:
    out = []
    for field, v in _fields(val):
        if field == 1:
            out.append(bytes(v).decode("utf-8", "replace"))
    return np.array(out, dtype=object)


def _tags_array(key_idx, val_idx, offsets, strings) -> pa.MapArray:
    keys = pa.array(strings[key_idx], pa.string())
    vals = pa.array(strings[val_idx], pa.string())
    return pa.MapArray.from_arrays(
        pa.array(offsets, pa.int32()), keys, vals)


def _dense_info(val: memoryview, n: int, date_gran: int):
    version = np.zeros(n, dtype=np.int32)
    ts = np.zeros(n, dtype=np.int64)
    changeset = np.zeros(n, dtype=np.int64)
    visible = np.ones(n, dtype=bool)
    for f2, v2 in _fields(val):
        if f2 == 1:
            version[:] = decode_packed_varints(bytes(v2))[:n] \
                .astype(np.int32)
        elif f2 == 2:
            ts[:] = np.cumsum(unzigzag(
                decode_packed_varints(bytes(v2))))[:n] * date_gran // 1000
        elif f2 == 3:
            changeset[:] = np.cumsum(unzigzag(
                decode_packed_varints(bytes(v2))))[:n]
        elif f2 == 6:
            vis = decode_packed_varints(bytes(v2))
            visible[:len(vis)] = vis.astype(bool)
    return version, ts, changeset, visible


def _info_fields(val: memoryview, date_gran: int):
    version, ts, changeset, visible = 0, 0, 0, True
    for f2, v2 in _fields(val):
        if f2 == 1:
            version = v2
        elif f2 == 2:
            ts = v2 * date_gran // 1000
        elif f2 == 3:
            changeset = v2
        elif f2 == 6:
            visible = bool(v2)
    return version, ts, changeset, visible


def parse_primitive_block(data: bytes):
    """One PrimitiveBlock -> (nodes, ways, relations) Arrow tables in the
    engine's element schema."""
    buf = memoryview(data)
    strings = np.array([], dtype=object)
    groups = []
    granularity, lat_off, lon_off, date_gran = 100, 0, 0, 1000
    for field, val in _fields(buf):
        if field == 1:
            strings = _decode_stringtable(val)
        elif field == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 18:
            date_gran = val
        elif field == 19:
            lat_off = val
        elif field == 20:
            lon_off = val

    n_id, n_lon, n_lat, n_tag_k, n_tag_v, n_tag_off = [], [], [], [], [], []
    n_meta = []
    w_rows = []
    r_rows = []

    for g in groups:
        for field, val in _fields(g):
            if field == 2:      # DenseNodes
                _decode_dense(val, granularity, lat_off, lon_off, date_gran,
                              n_id, n_lon, n_lat, n_tag_k, n_tag_v,
                              n_tag_off, n_meta)
            elif field == 1:    # plain Node (rare)
                _decode_plain_node(val, granularity, lat_off, lon_off,
                                   date_gran, n_id, n_lon, n_lat, n_tag_k,
                                   n_tag_v, n_tag_off, n_meta)
            elif field == 3:    # Way
                w_rows.append(_decode_way(val, date_gran))
            elif field == 4:    # Relation
                r_rows.append(_decode_relation(val, date_gran))

    nodes = _nodes_table(strings, n_id, n_lon, n_lat, n_tag_k, n_tag_v,
                         n_tag_off, n_meta)
    ways = _ways_table(strings, w_rows)
    rels = _relations_table(strings, r_rows)
    return nodes, ways, rels


def _decode_dense(val, granularity, lat_off, lon_off, date_gran,
                  n_id, n_lon, n_lat, n_tag_k, n_tag_v, n_tag_off, n_meta):
    ids = lats = lons = kv = None
    info = None
    for f2, v2 in _fields(val):
        if f2 == 1:
            ids = np.cumsum(unzigzag(decode_packed_varints(bytes(v2))))
        elif f2 == 5:
            info = v2
        elif f2 == 8:
            lats = np.cumsum(unzigzag(decode_packed_varints(bytes(v2))))
        elif f2 == 9:
            lons = np.cumsum(unzigzag(decode_packed_varints(bytes(v2))))
        elif f2 == 10:
            kv = decode_packed_varints(bytes(v2)).astype(np.int64)
    if ids is None:
        return
    n = len(ids)
    n_id.append(ids)
    n_lat.append((lat_off + granularity * lats) * NANO)
    n_lon.append((lon_off + granularity * lons) * NANO)
    # keys_vals: 0 terminates a node's tag list; pairs otherwise
    if kv is None or not len(kv):
        counts = np.zeros(n, dtype=np.int64)
        keys = vals = np.empty(0, dtype=np.int64)
    else:
        zero = kv == 0
        node_of = np.zeros(len(kv), dtype=np.int64)
        np.cumsum(zero[:-1], out=node_of[1:])
        nz = ~zero
        # parity within each node's run -> key (even) / value (odd)
        run_pos = np.arange(len(kv)) - np.concatenate(
            [[0], np.flatnonzero(zero) + 1])[node_of]
        keys = kv[nz & (run_pos % 2 == 0)]
        vals = kv[nz & (run_pos % 2 == 1)]
        counts = np.bincount(node_of[nz & (run_pos % 2 == 0)],
                             minlength=n)[:n]
    off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    n_tag_k.append(keys)
    n_tag_v.append(vals)
    n_tag_off.append(off)
    if info is not None:
        n_meta.append(_dense_info(info, n, date_gran))
    else:
        n_meta.append((np.zeros(n, np.int32), np.zeros(n, np.int64),
                       np.zeros(n, np.int64), np.ones(n, bool)))


def _decode_plain_node(val, granularity, lat_off, lon_off, date_gran,
                       n_id, n_lon, n_lat, n_tag_k, n_tag_v, n_tag_off,
                       n_meta):
    nid, lat, lon = 0, 0, 0
    keys = vals = np.empty(0, dtype=np.int64)
    meta = (np.zeros(1, np.int32), np.zeros(1, np.int64),
            np.zeros(1, np.int64), np.ones(1, bool))
    for f2, v2 in _fields(val):
        if f2 == 1:
            nid = unzigzag(np.array([v2], np.uint64))[0]
        elif f2 == 2:
            keys = decode_packed_varints(bytes(v2)).astype(np.int64)
        elif f2 == 3:
            vals = decode_packed_varints(bytes(v2)).astype(np.int64)
        elif f2 == 4:
            v, t, c, vis = _info_fields(v2, date_gran)
            meta = (np.array([v], np.int32), np.array([t], np.int64),
                    np.array([c], np.int64), np.array([vis], bool))
        elif f2 == 8:
            lat = unzigzag(np.array([v2], np.uint64))[0]
        elif f2 == 9:
            lon = unzigzag(np.array([v2], np.uint64))[0]
    n_id.append(np.array([nid], np.int64))
    n_lat.append(np.array([(lat_off + granularity * lat) * NANO]))
    n_lon.append(np.array([(lon_off + granularity * lon) * NANO]))
    n_tag_k.append(keys)
    n_tag_v.append(vals)
    n_tag_off.append(np.array([0, len(keys)], np.int64))
    n_meta.append(meta)


def _signed64(v: int) -> int:
    """protobuf int64 varints are two's-complement (negative ids — e.g.
    synthesized elements — arrive as 10-byte varints near 2^64)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _decode_way(val, date_gran):
    wid = 0
    keys = vals = np.empty(0, dtype=np.int64)
    refs = np.empty(0, dtype=np.int64)
    meta = (0, 0, 0, True)
    for f2, v2 in _fields(val):
        if f2 == 1:
            wid = _signed64(v2)
        elif f2 == 2:
            keys = decode_packed_varints(bytes(v2)).astype(np.int64)
        elif f2 == 3:
            vals = decode_packed_varints(bytes(v2)).astype(np.int64)
        elif f2 == 4:
            meta = _info_fields(v2, date_gran)
        elif f2 == 8:
            refs = np.cumsum(unzigzag(decode_packed_varints(bytes(v2))))
    return wid, refs, keys, vals, meta


def _decode_relation(val, date_gran):
    rid = 0
    keys = vals = np.empty(0, dtype=np.int64)
    roles = memids = types = np.empty(0, dtype=np.int64)
    meta = (0, 0, 0, True)
    for f2, v2 in _fields(val):
        if f2 == 1:
            rid = _signed64(v2)
        elif f2 == 2:
            keys = decode_packed_varints(bytes(v2)).astype(np.int64)
        elif f2 == 3:
            vals = decode_packed_varints(bytes(v2)).astype(np.int64)
        elif f2 == 4:
            meta = _info_fields(v2, date_gran)
        elif f2 == 8:
            roles = decode_packed_varints(bytes(v2)).astype(np.int64)
        elif f2 == 9:
            memids = np.cumsum(unzigzag(decode_packed_varints(bytes(v2))))
        elif f2 == 10:
            types = decode_packed_varints(bytes(v2)).astype(np.int64)
    return rid, memids, types, roles, keys, vals, meta


def _ts_array(seconds: np.ndarray) -> pa.Array:
    return pa.array(seconds.astype("int64"), pa.int64()).cast(
        pa.timestamp("s"))


def _nodes_table(strings, n_id, n_lon, n_lat, n_tag_k, n_tag_v, n_tag_off,
                 n_meta) -> pa.Table:
    if not n_id:
        return pa.table({
            "id": pa.array([], pa.int64()),
            "lon": pa.array([], pa.float64()),
            "lat": pa.array([], pa.float64()),
            "tags": pa.array([], TAGS_T),
            "version": pa.array([], pa.int32()),
            "changeset": pa.array([], pa.int64()),
            "timestamp": pa.array([], pa.timestamp("s")),
            "visible": pa.array([], pa.bool_()),
        })
    ids = np.concatenate(n_id).astype(np.int64)
    # stitch per-group tag CSRs into one map column
    counts = [off[1:] - off[:-1] for off in n_tag_off]
    all_counts = np.concatenate(counts)
    off = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(all_counts, out=off[1:])
    key_idx = np.concatenate(n_tag_k).astype(np.int64) if n_tag_k else \
        np.empty(0, np.int64)
    val_idx = np.concatenate(n_tag_v).astype(np.int64) if n_tag_v else \
        np.empty(0, np.int64)
    version = np.concatenate([m[0] for m in n_meta])
    ts = np.concatenate([m[1] for m in n_meta])
    changeset = np.concatenate([m[2] for m in n_meta])
    visible = np.concatenate([m[3] for m in n_meta])
    return pa.table({
        "id": pa.array(ids),
        "lon": pa.array(np.concatenate(n_lon)),
        "lat": pa.array(np.concatenate(n_lat)),
        "tags": _tags_array(key_idx, val_idx, off, strings),
        "version": pa.array(version, pa.int32()),
        "changeset": pa.array(changeset, pa.int64()),
        "timestamp": _ts_array(ts),
        "visible": pa.array(visible, pa.bool_()),
    })


def _ways_table(strings, rows) -> pa.Table:
    ids = pa.array([r[0] for r in rows], pa.int64())
    refs = pa.array([r[1] for r in rows], pa.list_(pa.int64()))
    counts = np.array([len(r[2]) for r in rows], dtype=np.int64)
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    key_idx = np.concatenate([r[2] for r in rows]) if rows else \
        np.empty(0, np.int64)
    val_idx = np.concatenate([r[3] for r in rows]) if rows else \
        np.empty(0, np.int64)
    return pa.table({
        "id": ids,
        "refs": refs,
        "tags": _tags_array(key_idx.astype(np.int64),
                            val_idx.astype(np.int64), off, strings),
        "version": pa.array([r[4][0] for r in rows], pa.int32()),
        "timestamp": _ts_array(np.array([r[4][1] for r in rows],
                                        np.int64)),
        "visible": pa.array([r[4][3] for r in rows], pa.bool_()),
    })


def _relations_table(strings, rows) -> pa.Table:
    members = []
    for r in rows:
        rid, memids, types, roles, *_ = r
        members.append([
            {"member_id": int(m), "member_type": _MEMBER_TYPES[t],
             "member_role": str(strings[ro]) if ro < len(strings) else ""}
            for m, t, ro in zip(memids, types, roles)])
    counts = np.array([len(r[4]) for r in rows], dtype=np.int64)
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    key_idx = np.concatenate([r[4] for r in rows]) if rows else \
        np.empty(0, np.int64)
    val_idx = np.concatenate([r[5] for r in rows]) if rows else \
        np.empty(0, np.int64)
    return pa.table({
        "id": pa.array([r[0] for r in rows], pa.int64()),
        "members": pa.array(members, MEMBERS_T),
        "tags": _tags_array(key_idx.astype(np.int64),
                            val_idx.astype(np.int64), off, strings),
        "version": pa.array([r[6][0] for r in rows], pa.int32()),
        "timestamp": _ts_array(np.array([r[6][1] for r in rows],
                                        np.int64)),
        "visible": pa.array([r[6][3] for r in rows], pa.bool_()),
    })


# ---------------------------------------------------------------------------
# Ray Data composition
# ---------------------------------------------------------------------------

_KIND_IDX = {"nodes": 0, "ways": 1, "relations": 2}


def read_pbf(path: str, kind: str = "nodes"):
    """Dataset over one element kind of a ``.osm.pbf``: driver scans the
    blob index, tasks decode their own byte ranges."""
    import ray.data as rd
    idx = [b for b in scan_blob_index(path) if b["type"] == "OSMData"]
    sel = _KIND_IDX[kind]

    def decode(batch) -> pa.Table:
        parts = []
        for off, size in zip(batch["offset"], batch["size"]):
            data = read_blob_data(path, int(off), int(size))
            parts.append(parse_primitive_block(data)[sel])
        parts = [p for p in parts if p.num_rows] or parts[:1]
        return pa.concat_tables(parts)

    ds = rd.from_items(idx)
    if len(idx) > 1:
        ds = ds.repartition(len(idx))
    return ds.map_batches(decode, batch_format="numpy")


def read_pbf_header(path: str) -> dict:
    for b in scan_blob_index(path):
        if b["type"] == "OSMHeader":
            return parse_header_block(
                read_blob_data(path, b["offset"], b["size"]))
    return {"bbox": None, "required_features": [], "optional_features": []}


def pbf_to_parquet(path: str, out_dir: str) -> dict:
    """One streaming pass: decode every data blob and write the three
    element tables under ``out_dir`` in the engine's fixture schema
    (``osm_nodes.parquet/part-<offset>.parquet`` etc. — one deterministic
    fragment per blob, so a re-run skips nothing but stays idempotent).
    Returns element counts."""
    import pyarrow.parquet as pq
    import ray.data as rd
    for t in ("osm_nodes", "osm_ways", "osm_relations"):
        os.makedirs(os.path.join(out_dir, f"{t}.parquet"), exist_ok=True)
    idx = [b for b in scan_blob_index(path) if b["type"] == "OSMData"]

    def decode_write(batch) -> pa.Table:
        counts = np.zeros(3, dtype=np.int64)
        for off, size in zip(batch["offset"], batch["size"]):
            data = read_blob_data(path, int(off), int(size))
            tables = parse_primitive_block(data)
            for t, name in zip(tables, ("osm_nodes", "osm_ways",
                                        "osm_relations")):
                if t.num_rows:
                    pq.write_table(t, os.path.join(
                        out_dir, f"{name}.parquet",
                        f"part-{int(off):012d}.parquet"))
            counts += [t.num_rows for t in tables]
        return pa.table({"nodes": pa.array([counts[0]]),
                         "ways": pa.array([counts[1]]),
                         "relations": pa.array([counts[2]])})

    ds = rd.from_items(idx)
    if len(idx) > 1:
        ds = ds.repartition(len(idx))
    agg = ds.map_batches(decode_write, batch_format="numpy").to_pandas()
    # an extract with no relations (or no ways) would leave an empty
    # fragment directory that OSM._schema/_read cannot open — back-fill a
    # zero-row typed fragment so every element table is always readable
    no_strings = np.array([], dtype=object)
    empties = {
        "osm_nodes": _nodes_table(no_strings, [], [], [], [], [], [], []),
        "osm_ways": _ways_table(no_strings, []),
        "osm_relations": _relations_table(no_strings, []),
    }
    for name, empty_t in empties.items():
        d = os.path.join(out_dir, f"{name}.parquet")
        if not any(e.name.endswith(".parquet") for e in os.scandir(d)):
            pq.write_table(empty_t, os.path.join(d, "part-empty.parquet"))
    return {k: int(agg[k].sum()) for k in ("nodes", "ways", "relations")}
