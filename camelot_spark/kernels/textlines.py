"""Struct-of-arrays textline container + geometric filters.

Replaces the reference's PDFMiner object lists (`camelot/utils.py:817-854`
``get_text_objects``) with a pandas frame whose columns are numpy arrays,
so every downstream predicate is a vectorized mask instead of a Python
list comprehension (e.g. ``text_in_bbox`` `camelot/utils.py:354-379`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

TL_COLUMNS = ["x0", "y0", "x1", "y1", "text", "chars", "offset"]


def make_textlines(records: list[dict]) -> pd.DataFrame:
    """Build a textline frame from parsed span payload dicts.

    Each record: {x0, y0, x1, y1, t (text), chars (list|None), offset}.
    """
    if not records:
        return empty_textlines()
    df = pd.DataFrame(
        {
            "x0": np.asarray([r["x0"] for r in records], dtype=np.float64),
            "y0": np.asarray([r["y0"] for r in records], dtype=np.float64),
            "x1": np.asarray([r["x1"] for r in records], dtype=np.float64),
            "y1": np.asarray([r["y1"] for r in records], dtype=np.float64),
            "text": pd.Series([r["t"] for r in records], dtype=object),
            "chars": pd.Series([r.get("chars") for r in records], dtype=object),
            "offset": np.asarray([r.get("offset", -1) for r in records], dtype=np.int64),
        }
    )
    return df


def empty_textlines() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "x0": np.empty(0, dtype=np.float64),
            "y0": np.empty(0, dtype=np.float64),
            "x1": np.empty(0, dtype=np.float64),
            "y1": np.empty(0, dtype=np.float64),
            "text": pd.Series([], dtype=object),
            "chars": pd.Series([], dtype=object),
            "offset": np.empty(0, dtype=np.int64),
        }
    )


def sort_reading_order(tl: pd.DataFrame) -> pd.DataFrame:
    """Reading-order sort ``(-y0, x0)`` — `camelot/parsers/stream.py:277,326`."""
    return tl.sort_values(["y0", "x0"], ascending=[False, True], kind="stable").reset_index(
        drop=True
    )


def sort_vertical_order(tl: pd.DataFrame) -> pd.DataFrame:
    """Vertical-text sort ``(x0, -y0)`` — `camelot/parsers/stream.py:327`."""
    return tl.sort_values(["x0", "y0"], ascending=[True, False], kind="stable").reset_index(
        drop=True
    )


def text_in_bbox(bbox: tuple, tl: pd.DataFrame) -> pd.DataFrame:
    """Textlines whose midpoint lies in bbox ± 2pt.

    Vectorized form of `camelot/utils.py:354-379`: keep lines with
    ``lb-2 <= mid <= rt+2`` on both axes.
    """
    if len(tl) == 0:
        return tl
    x_mid = (tl["x0"].to_numpy() + tl["x1"].to_numpy()) / 2.0
    y_mid = (tl["y0"].to_numpy() + tl["y1"].to_numpy()) / 2.0
    m = (
        (bbox[0] - 2 <= x_mid)
        & (x_mid <= bbox[2] + 2)
        & (bbox[1] - 2 <= y_mid)
        & (y_mid <= bbox[3] + 2)
    )
    return tl[m].reset_index(drop=True)


def text_in_bbox_mask(bbox: tuple, tl: pd.DataFrame) -> np.ndarray:
    """Boolean mask variant of :func:`text_in_bbox` (same predicate)."""
    if len(tl) == 0:
        return np.zeros(0, dtype=bool)
    x_mid = (tl["x0"].to_numpy() + tl["x1"].to_numpy()) / 2.0
    y_mid = (tl["y0"].to_numpy() + tl["y1"].to_numpy()) / 2.0
    return (
        (bbox[0] - 2 <= x_mid)
        & (x_mid <= bbox[2] + 2)
        & (bbox[1] - 2 <= y_mid)
        & (y_mid <= bbox[3] + 2)
    )


def segments_in_bbox(
    bbox: tuple, v_segments: np.ndarray, h_segments: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Ruling segments inside bbox ± 2pt — `camelot/utils.py:317-351`.

    ``v_segments``/``h_segments`` are (N,4) float arrays (x1,y1,x2,y2),
    vertical as (x, y_bottom, x, y_top), horizontal as (x_left, y, x_right, y).
    """
    v = np.asarray(v_segments, dtype=np.float64).reshape(-1, 4)
    h = np.asarray(h_segments, dtype=np.float64).reshape(-1, 4)
    lb0, lb1, rt0, rt1 = bbox[0], bbox[1], bbox[2], bbox[3]
    vm = (v[:, 1] > lb1 - 2) & (v[:, 3] < rt1 + 2) & (lb0 - 2 <= v[:, 0]) & (v[:, 0] <= rt0 + 2)
    hm = (h[:, 0] > lb0 - 2) & (h[:, 2] < rt0 + 2) & (lb1 - 2 <= h[:, 1]) & (h[:, 1] <= rt1 + 2)
    return v[vm], h[hm]


def nonblank_mask(tl: pd.DataFrame) -> np.ndarray:
    """Lines with non-blank text after strip (`stream.py:129`)."""
    return tl["text"].str.strip().str.len().fillna(0).to_numpy() > 0


def text_bbox(frames: list[pd.DataFrame]) -> tuple[float, float, float, float]:
    """Bounding box over all text — `camelot/parsers/stream.py:82-103`."""
    xs0 = np.concatenate([f["x0"].to_numpy() for f in frames if len(f)])
    ys0 = np.concatenate([f["y0"].to_numpy() for f in frames if len(f)])
    xs1 = np.concatenate([f["x1"].to_numpy() for f in frames if len(f)])
    ys1 = np.concatenate([f["y1"].to_numpy() for f in frames if len(f)])
    return float(xs0.min()), float(ys0.min()), float(xs1.max()), float(ys1.max())
