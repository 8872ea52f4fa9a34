"""Column inference for the Stream flavor.

Re-derives `camelot/parsers/stream.py:139-181` (``_merge_columns``),
`:210-236` (``_add_columns``), `:238-260` (``_join_columns``) and the
mode-of-row-lengths column-count guess (`:347-364`).
"""

from __future__ import annotations

import warnings

import numpy as np
import pandas as pd

from . import rows as rows_kernel


def mode_ncols(elements: list[int]) -> int | None:
    """Modal row length — `camelot/parsers/stream.py:349-358`.

    ``max(set(e), key=e.count)``; if the mode is 1, retry with 1s
    removed; None if nothing remains (no table). Ties break toward the
    smallest value (CPython small-int set iteration order).
    """
    if not elements:
        return None
    vals, counts = np.unique(np.asarray(elements, dtype=np.int64), return_counts=True)
    ncols = int(vals[np.argmax(counts)])  # np.unique sorts → ties → smallest
    if ncols == 1:
        kept = [e for e in elements if e != 1]
        if kept:
            vals, counts = np.unique(np.asarray(kept, dtype=np.int64), return_counts=True)
            ncols = int(vals[np.argmax(counts)])
        else:
            return None
    return ncols


def merge_columns(intervals: list[tuple[float, float]], column_tol: float = 0):
    """Sorted-interval union with tolerance — `stream.py:139-181`.

    Sequential left-fold (the negative-tolerance branch depends on the
    running last element, so order matters).
    """
    merged: list[tuple[float, float]] = []
    for higher in intervals:
        if not merged:
            merged.append(higher)
            continue
        lower = merged[-1]
        if column_tol >= 0:
            if higher[0] <= lower[1] or np.isclose(higher[0], lower[1], atol=column_tol):
                merged[-1] = (min(lower[0], higher[0]), max(lower[1], higher[1]))
            else:
                merged.append(higher)
        else:
            if higher[0] <= lower[1]:
                if np.isclose(higher[0], lower[1], atol=abs(column_tol)):
                    merged.append(higher)
                else:
                    merged[-1] = (min(lower[0], higher[0]), max(lower[1], higher[1]))
            else:
                merged.append(higher)
    return merged


def add_columns(
    cols: list[tuple[float, float]], text: pd.DataFrame, row_tol: float
) -> list[tuple[float, float]]:
    """Extend columns from stray text — `stream.py:210-236`.

    Re-runs row grouping on the leftover text, keeps rows of maximal
    length, merges their x-extents into the column list.
    """
    if len(text):
        grouped = rows_kernel.group_rows(text, row_tol=row_tol)
        elements = [len(r) for r in grouped]
        if elements:
            mx = max(elements)
            new_cols = [
                (float(t.x0), float(t.x1))
                for r in grouped
                if len(r) == mx
                for t in r.itertuples()
            ]
            cols = cols + merge_columns(sorted(new_cols))
    return cols


def join_columns(
    cols: list[tuple[float, float]], text_x_min: float, text_x_max: float
) -> list[tuple[float, float]]:
    """Continuous column x-intervals — `stream.py:238-260`."""
    cols = sorted(cols)
    bounds = [(cols[i][0] + cols[i - 1][1]) / 2.0 for i in range(1, len(cols))]
    bounds.insert(0, text_x_min)
    bounds.append(text_x_max)
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def infer_columns(
    rows_grouped: list[pd.DataFrame],
    elements: list[int],
    t_frames: list[pd.DataFrame],
    text_x_min: float,
    text_x_max: float,
    row_tol: float,
    column_tol: float,
    table_label: str = "",
) -> list[tuple[float, float]]:
    """Full inferred-columns path — `stream.py:347-385`.

    ``t_frames`` is [horizontal, vertical] in the reference's dict
    iteration order, used for the inner/outer stray-text scan.
    """
    ncols = mode_ncols(elements)
    if ncols is None:
        warnings.warn(f"No tables found in table area {table_label}")
        ncols = 1  # reference proceeds with stale ncols==1 after the warn
    cols = [
        (float(t.x0), float(t.x1))
        for r in rows_grouped
        if len(r) == ncols
        for t in r.itertuples()
    ]
    cols = merge_columns(sorted(cols), column_tol=column_tol)

    inner_parts = []
    for i in range(1, len(cols)):
        left = cols[i - 1][1]
        right = cols[i][0]
        for f in t_frames:
            if len(f) == 0:
                continue
            m = (f["x0"].to_numpy() > left) & (f["x1"].to_numpy() < right)
            if m.any():
                inner_parts.append(f[m])
    if cols:
        for f in t_frames:
            if len(f) == 0:
                continue
            m = (f["x0"].to_numpy() > cols[-1][1]) | (f["x1"].to_numpy() < cols[0][0])
            if m.any():
                inner_parts.append(f[m])
    if inner_parts:
        inner_text = pd.concat(inner_parts, ignore_index=True)
    else:
        inner_text = t_frames[0].iloc[0:0]
    cols = add_columns(cols, inner_text, row_tol)
    return join_columns(cols, text_x_min, text_x_max)
