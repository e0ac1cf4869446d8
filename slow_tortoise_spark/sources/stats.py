"""Parquet footer statistics: the data-skipping side of table layout.

A 100 TB scan is won or lost before any task runs: the planner prunes
files/row-groups whose footer min/max cannot satisfy the predicate.
These helpers read that metadata directly (pyarrow, driver-side — the
same O(#files) listing work any planner does) to MEASURE skipping
instead of guessing: lay data out (e.g. ``tiles.zorder_write``), then
ask "what fraction of the files would this predicate actually touch?".
"""

from __future__ import annotations

import glob
import os


def file_column_ranges(path: str, col: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) of ``col`` from parquet footers only —
    no data pages are read.  Files lacking statistics report (None,
    None) and must be treated as un-prunable."""
    import pyarrow.parquet as pq

    out = []
    files = sorted(
        glob.glob(os.path.join(path, "*.parquet"))
        or glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    for f in files:
        meta = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema != col or c.statistics is None:
                    continue
                s = c.statistics
                if not s.has_min_max:
                    continue
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
        out.append((f, lo, hi))
    return out


def pruning_report(
    path: str, col: str, lo, hi
) -> dict[str, float | int]:
    """How well does the layout skip for ``lo <= col <= hi``?  A file
    survives if its [min, max] intersects the query interval (or has no
    stats).  Returns counts and the pruned fraction — the number to
    compare across layouts: Z-ordered writes give disjoint per-file
    ranges, so box queries touch O(matching) files; the same data
    written unordered leaves every file spanning the full domain and
    nothing prunes."""
    ranges = file_column_ranges(path, col)
    total = len(ranges)
    kept = sum(
        1
        for _, fmin, fmax in ranges
        if fmin is None or fmax is None or (fmax >= lo and fmin <= hi)
    )
    return {
        "files_total": total,
        "files_scanned": kept,
        "files_pruned": total - kept,
        "pruned_fraction": (total - kept) / total if total else 0.0,
    }
