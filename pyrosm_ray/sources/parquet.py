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
    items = [{"path": f, "rgs": rgs} for f, rgs in tasks]

    def load(batch):
        import pyarrow as pa
        parts = [
            pq.ParquetFile(p.as_py()).read_row_groups(
                rgs.as_py(), columns=columns)
            for p, rgs in zip(batch["path"], batch["rgs"])]
        return parts[0] if len(parts) == 1 else pa.concat_tables(parts)

    return rd.from_items(items, override_num_blocks=len(items)).map_batches(
        load, batch_format="pyarrow")
