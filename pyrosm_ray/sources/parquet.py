"""Row-group-splitting parquet reader.

``ray.data.read_parquet`` (2.49) plans ONE read task per FILE — a
single-file table decodes serially no matter what ``override_num_blocks``
asks for, which silently caps every downstream stage's parallelism (the
root cause of the round-2 "anti-scaling" layer pipelines: the whole
read→filter→assemble chain fused into 1-2 tasks). Parquet files already
carry a natural split boundary — the row group — so this reader plans one
Ray task per row-group *range* and decodes them concurrently:

    from_items([{path, row-group ids}, ...])  ->  map_batches(load)

Planning touches only file metadata (footer) on the driver; the data
itself is decoded inside the tasks, column-pruned, straight into Arrow
blocks. Falls back to ``ray.data.read_parquet`` when there is nothing to
split (≤1 planned task).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import ray.data as rd

DEFAULT_TARGET_BYTES = 8 << 20  # uncompressed row-group bytes per task


def _parquet_files(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(e.path for e in os.scandir(path)
                      if e.name.endswith(".parquet"))
    return [path]


def _plan_tasks(files: list[str], target_bytes: int):
    tasks: list[tuple[str, list[int]]] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        cur: list[int] = []
        cur_bytes = 0
        for i in range(md.num_row_groups):
            cur.append(i)
            cur_bytes += md.row_group(i).total_byte_size
            if cur_bytes >= target_bytes:
                tasks.append((f, cur))
                cur, cur_bytes = [], 0
        if cur:
            tasks.append((f, cur))
    return tasks


def read_parquet_split(path: str, columns: list[str] | None = None,
                       num_blocks: int | None = None,
                       target_bytes: int | None = None) -> "rd.Dataset":
    """Read parquet with row-group-level task splitting (see module doc).

    ``num_blocks`` sizes the per-task byte target from the table's total
    metadata size; ``target_bytes`` overrides it directly."""
    files = _parquet_files(path)
    if target_bytes is None:
        if num_blocks:
            total = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                total += sum(md.row_group(i).total_byte_size
                             for i in range(md.num_row_groups))
            target_bytes = max(1, total // num_blocks)
        else:
            target_bytes = DEFAULT_TARGET_BYTES
    tasks = _plan_tasks(files, target_bytes)
    if len(tasks) <= 1:
        return rd.read_parquet(path, columns=columns)
    return rd.read_datasource(
        _RowGroupDatasource(tasks, columns),
        override_num_blocks=len(tasks))


from ray.data.datasource import Datasource as _Datasource


class _RowGroupDatasource(_Datasource):
    """One ReadTask per row-group range with REAL row/byte metadata.

    Crucial detail vs the tempting ``from_items + map_batches(load)``
    shape: item rows weigh 1 row each, so any fused downstream stage with
    a ``batch_size`` bundles ALL planned read tasks into one Ray task
    (Ray sizes bundles by input rows) — the whole chain silently runs
    serially. ReadTasks declare the decoded row counts, so bundling and
    fusion see the true weights."""

    def __init__(self, tasks, columns):
        self._tasks = tasks
        self._columns = columns
        self._metas = []
        for f, rgs in tasks:
            md = pq.ParquetFile(f).metadata
            self._metas.append((
                sum(md.row_group(i).num_rows for i in rgs),
                sum(md.row_group(i).total_byte_size for i in rgs)))

    def estimate_inmemory_data_size(self):
        return sum(b for _, b in self._metas)

    def get_name(self) -> str:
        return "ParquetRowGroups"

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource import ReadTask
        columns = self._columns
        out = []
        for (f, rgs), (n, b) in zip(self._tasks, self._metas):
            def _read(f=f, rgs=list(rgs)):
                return [pq.ParquetFile(f).read_row_groups(
                    rgs, columns=columns)]
            out.append(ReadTask(_read, BlockMetadata(
                num_rows=n, size_bytes=b, exec_stats=None,
                input_files=[f])))
        return out
