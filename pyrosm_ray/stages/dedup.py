"""Deduplication operators for the documents table (training-data pipeline).

Five families, each a ``queries()``-exposed pipeline (SURVEY.md §2.7 notes
the reference only has exact id-dedup — these are the engine's large-scale
additions):

* :func:`exact_dedup` — hash-partition on a content hash, keep the minimum
  id per group (the canonical Ray exact dedup; SQL-oracle-able via md5).
* :func:`minhash_dedup` — word-shingle -> 64 minhash permutations -> banded
  LSH buckets (groupby) -> exact-Jaccard verification -> union-find clusters.
* :func:`simhash_dedup` — 64-bit simhash, candidates from 16-bit band
  equality (Hamming<=3 guarantee by pigeonhole over 4 bands), verified by
  true Hamming distance.
* :func:`ngram_jaccard_pairs` — exact character-n-gram Jaccard over LSH
  candidates.
* :func:`embedding_near_dup` — cosine-similarity near-dup pairs over the
  embeddings table (brute force per block against a broadcast matrix).

Scale notes: signatures are computed per batch (stateless, vectorised with
segment reductions); the only shuffles are the banded groupbys whose keys
are (band, bucket-hash) — bounded-size groups by construction. Union-find
runs driver-side over the (tiny) verified-pair set, like the reference keeps
its sequential tails driver-side (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MERSENNE61 = np.uint64((1 << 61) - 1)


def _stable64(s: str) -> int:
    """Process-stable 64-bit string hash (Python's hash() is salted per
    process, which would scatter identical shingles across workers)."""
    import hashlib
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


def _hash64(arr: np.ndarray, seed: int) -> np.ndarray:
    """Cheap xorshift-multiply hash of uint64 -> uint64."""
    with np.errstate(over="ignore"):
        x = arr.astype(np.uint64) + np.uint64(
            (seed * 0x9E3779B97F4A7C15 or 1) & 0xFFFFFFFFFFFFFFFF)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(33)
    return x


def _word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashes of the k-word shingles of ``text`` (lowered, whitespace split)."""
    words = text.lower().split()
    if len(words) < k:
        words = words + [""] * (k - len(words))
    h = np.array([_stable64(" ".join(words[i:i + k]))
                  for i in range(max(1, len(words) - k + 1))],
                 dtype=np.uint64)
    return np.unique(h)


def _char_ngrams(text: str, n: int = 3) -> np.ndarray:
    t = " ".join(text.lower().split())
    if len(t) < n:
        t = t.ljust(n)
    h = np.array([_stable64(t[i:i + n])
                  for i in range(len(t) - n + 1)], dtype=np.uint64)
    return np.unique(h)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the minimum-id row per normalised-content hash.

    Normalisation = lower + whitespace collapse. The groupby shuffles only
    (hash, id) pairs — content never moves; survivors are re-selected by id
    semi-join (broadcastable result of the tiny aggregate)."""
    import hashlib

    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        hs = [hashlib.md5(" ".join((t or "").lower().split()).encode())
              .hexdigest() for t in texts]
        return pa.table({
            "content_hash": pa.array(hs, pa.string()),
            id_col: batch[id_col],
        })

    keep = ds.map_batches(add_hash, batch_format="pyarrow") \
        .groupby("content_hash").min(id_col)
    keep_ids = np.sort(np.asarray(
        keep.to_pandas()[f"min({id_col})"].values, dtype=np.int64))
    import ray
    keep_ref = ray.put(keep_ids)

    def filter_kept(batch: pa.Table) -> pa.Table:
        import ray as _ray
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        ki = _ray.get(keep_ref)
        pos = np.clip(np.searchsorted(ki, ids), 0, max(len(ki) - 1, 0))
        m = ki[pos] == ids if len(ki) else np.zeros(len(ids), dtype=bool)
        return batch.filter(pa.array(m))

    return ds.map_batches(filter_kept, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures_batch(batch: pa.Table, id_col: str, text_col: str,
                             num_perm: int, k_shingle: int) -> pa.Table:
    """Per-doc minhash signatures, vectorised with segment minima."""
    texts = batch[text_col].to_pylist()
    sh = [_word_shingles(t or "", k_shingle) for t in texts]
    counts = np.array([len(s) for s in sh], dtype=np.int64)
    flat = np.concatenate(sh) if sh else np.empty(0, dtype=np.uint64)
    off = np.zeros(len(sh) + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    sigs = np.empty((len(sh), num_perm), dtype=np.uint64)
    for p in range(num_perm):
        v = _hash64(flat, p + 1)
        if len(v):
            sigs[:, p] = np.minimum.reduceat(v, off[:-1])
        else:
            sigs[:, p] = 0
    # pack shingle set for later exact-Jaccard verification
    blobs = [s.astype("<u8").tobytes() for s in sh]
    return pa.table({
        id_col: batch[id_col],
        "sig": pa.array([s.astype("<u8").tobytes() for s in sigs],
                        pa.binary()),
        "shingles": pa.array(blobs, pa.binary()),
    })


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


def _union_find_clusters(ids: np.ndarray, pairs: list[tuple[int, int]]):
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {int(i): find(int(i)) for i in ids}


def minhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  num_perm: int = 64, bands: int = 16, k_shingle: int = 3,
                  threshold: float = 0.8):
    """Near-dup detection: returns a Dataset of (id, dup_of) where
    ``dup_of`` is the cluster's canonical (minimum) id; singleton docs map
    to themselves."""
    import ray

    rows = num_perm // bands

    sig_ds = ds.map_batches(
        lambda b: minhash_signatures_batch(b, id_col, text_col, num_perm,
                                           k_shingle),
        batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        sigs = np.frombuffer(b"".join(batch["sig"].to_pylist()),
                             dtype="<u8").reshape(len(batch), num_perm)
        out_band, out_key, out_id, out_sh = [], [], [], []
        shingles = batch["shingles"].to_pylist()
        for b_i in range(bands):
            seg = sigs[:, b_i * rows:(b_i + 1) * rows]
            key = _hash64(seg[:, 0], 101 + b_i)
            for c in range(1, rows):
                with np.errstate(over="ignore"):
                    key = _hash64(key ^ seg[:, c], 202 + c)
            out_band.append(np.full(len(batch), b_i, dtype=np.int64))
            out_key.append(key.astype(np.int64))
            out_id.append(ids)
            out_sh.extend(shingles)
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "bucket": pa.array(np.concatenate(out_key)),
            id_col: pa.array(np.concatenate(out_id)),
            "shingles": pa.array(out_sh, pa.binary()),
        })

    banded = sig_ds.map_batches(band_rows, batch_format="pyarrow")

    def verify_group(group: pa.Table) -> pa.Table:
        n = len(group)
        if n < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        ids = np.asarray(group[id_col].to_numpy(zero_copy_only=False))
        sh = [np.frombuffer(x, dtype="<u8")
              for x in group["shingles"].to_pylist()]
        a_out, b_out, j_out = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                if ids[i] == ids[j]:
                    continue
                jac = _jaccard(sh[i], sh[j])
                if jac >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(jac)
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    pairs_ds = banded.groupby(["band", "bucket"]).map_groups(
        verify_group, batch_format="pyarrow")
    pair_df = pairs_ds.to_pandas().drop_duplicates(["a", "b"])
    pairs = list(zip(pair_df["a"], pair_df["b"]))

    all_ids = np.asarray(
        ds.select_columns([id_col]).to_pandas()[id_col].values)
    mapping = _union_find_clusters(all_ids, pairs)
    map_ref = ray.put(mapping)

    def attach(batch: pa.Table) -> pa.Table:
        m = ray.get(map_ref)
        ids = batch[id_col].to_pylist()
        return batch.append_column(
            "dup_of", pa.array([m.get(int(i), int(i)) for i in ids],
                               pa.int64()))

    return ds.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, id_col: str, text_col: str) -> pa.Table:
    texts = batch[text_col].to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = (t or "").lower().split()
        if not words:
            out[i] = 0
            continue
        hs = _hash64(np.array([_stable64(w) for w in words],
                              dtype=np.uint64), 7)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) &
                np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        out[i] = np.packbits((v > 0).astype(np.uint8)[::-1]).view(">u8")[0]
    return pa.table({id_col: batch[id_col],
                     "simhash": pa.array(out.astype(np.int64))})


def simhash_dedup(ds, id_col: str = "doc_id", text_col: str = "text",
                  max_hamming: int = 3):
    """Candidate pairs via 16-bit band equality (4 bands: any pair with
    Hamming<=3 shares at least one exact band), verified by true Hamming."""
    sig = ds.map_batches(lambda b: simhash_batch(b, id_col, text_col),
                         batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        sh = np.asarray(batch["simhash"].to_numpy(zero_copy_only=False)
                        ).astype(np.uint64)
        bands_out, keys, oids, sigs = [], [], [], []
        for b_i in range(4):
            part = (sh >> np.uint64(16 * b_i)) & np.uint64(0xFFFF)
            bands_out.append(np.full(len(ids), b_i, dtype=np.int64))
            keys.append(part.astype(np.int64))
            oids.append(ids)
            sigs.append(sh.astype(np.int64))
        return pa.table({
            "band": pa.array(np.concatenate(bands_out)),
            "bucket": pa.array(np.concatenate(keys)),
            id_col: pa.array(np.concatenate(oids)),
            "simhash": pa.array(np.concatenate(sigs)),
        })

    def verify_group(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_numpy(zero_copy_only=False))
        sh = np.asarray(group["simhash"].to_numpy(zero_copy_only=False)
                        ).astype(np.uint64)
        a_out, b_out, d_out = [], [], []
        n = len(ids)
        for i in range(n):
            x = sh[i] ^ sh[i + 1:]
            ham = np.array([bin(int(v)).count("1") for v in x])
            for j in np.flatnonzero(ham <= max_hamming):
                a, b = sorted((int(ids[i]), int(ids[i + 1 + j])))
                if a != b:
                    a_out.append(a)
                    b_out.append(b)
                    d_out.append(int(ham[j]))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "hamming": pa.array(d_out, pa.int64())})

    pairs = sig.map_batches(band_rows, batch_format="pyarrow") \
        .groupby(["band", "bucket"]).map_groups(verify_group,
                                                batch_format="pyarrow")
    return pairs


# ---------------------------------------------------------------------------
# n-gram jaccard + embedding cosine near-dup
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3, threshold: float = 0.8,
                        num_perm: int = 64, bands: int = 16):
    """Exact character-n-gram Jaccard >= threshold pairs, LSH-pruned."""
    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        sh = [_char_ngrams(t or "", n) for t in texts]
        counts = np.array([len(s) for s in sh], dtype=np.int64)
        flat = np.concatenate(sh) if sh else np.empty(0, dtype=np.uint64)
        off = np.zeros(len(sh) + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        out = np.empty((len(sh), num_perm), dtype=np.uint64)
        for p in range(num_perm):
            v = _hash64(flat, 31 + p)
            out[:, p] = np.minimum.reduceat(v, off[:-1]) if len(v) else 0
        return pa.table({
            id_col: batch[id_col],
            "sig": pa.array([s.astype("<u8").tobytes() for s in out],
                            pa.binary()),
            "shingles": pa.array([s.astype("<u8").tobytes() for s in sh],
                                 pa.binary()),
        })

    rows = num_perm // bands
    sig_ds = ds.map_batches(sigs, batch_format="pyarrow")

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        s = np.frombuffer(b"".join(batch["sig"].to_pylist()),
                          dtype="<u8").reshape(len(batch), num_perm)
        out = {"band": [], "bucket": [], id_col: [], "shingles": []}
        shingles = batch["shingles"].to_pylist()
        for b_i in range(bands):
            seg = s[:, b_i * rows:(b_i + 1) * rows]
            key = _hash64(seg[:, 0], 301 + b_i)
            for c in range(1, rows):
                key = _hash64(key ^ seg[:, c], 401 + c)
            out["band"].append(np.full(len(ids), b_i, dtype=np.int64))
            out["bucket"].append(key.astype(np.int64))
            out[id_col].append(ids)
            out["shingles"].extend(shingles)
        return pa.table({
            "band": pa.array(np.concatenate(out["band"])),
            "bucket": pa.array(np.concatenate(out["bucket"])),
            id_col: pa.array(np.concatenate(out[id_col])),
            "shingles": pa.array(out["shingles"], pa.binary()),
        })

    def verify_group(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_numpy(zero_copy_only=False))
        sh = [np.frombuffer(x, dtype="<u8")
              for x in group["shingles"].to_pylist()]
        a_out, b_out, j_out = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                jac = _jaccard(sh[i], sh[j])
                if jac >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    a_out.append(a)
                    b_out.append(b)
                    j_out.append(round(jac, 6))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "jaccard": pa.array(j_out, pa.float64())})

    return sig_ds.map_batches(band_rows, batch_format="pyarrow") \
        .groupby(["band", "bucket"]).map_groups(verify_group,
                                                batch_format="pyarrow")


def embedding_near_dup(ds, id_col: str = "vec_id",
                       emb_col: str = "embedding",
                       threshold: float = 0.95):
    """Cosine >= threshold pairs: every batch multiplies against the
    broadcast (normalised) full matrix — brute-force baseline; the LSH
    scale path is random-hyperplane simhash over embeddings."""
    import ray

    mats = []
    ids_all = []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
            batch_size=1 << 16, batch_format="pyarrow"):
        emb = np.array(b[emb_col].to_pylist(), dtype=np.float64)
        mats.append(emb)
        ids_all.append(np.asarray(b[id_col].to_numpy(zero_copy_only=False)))
    m = np.concatenate(mats) if mats else np.empty((0, 1))
    ids_all = np.concatenate(ids_all) if ids_all else np.empty(0, np.int64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    m = m / np.maximum(norms, 1e-12)
    ref = ray.put((ids_all, m))

    def pairs(batch: pa.Table) -> pa.Table:
        oids, om = ray.get(ref)
        ids = np.asarray(batch[id_col].to_numpy(zero_copy_only=False))
        emb = np.array(batch[emb_col].to_pylist(), dtype=np.float64)
        emb = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True),
                               1e-12)
        sim = emb @ om.T
        ai, bi = np.nonzero(sim >= threshold)
        keep = ids[ai] < oids[bi]  # dedupe symmetric pairs
        return pa.table({
            "a": pa.array(ids[ai][keep], pa.int64()),
            "b": pa.array(oids[bi][keep], pa.int64()),
            "cosine": pa.array(np.round(sim[ai, bi][keep], 6), pa.float64()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow")
