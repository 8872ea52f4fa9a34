"""TextEdge accumulation and table-area detection (Nurminen-style).

Re-derives `camelot/core.py:21-231` (TextEdge / TextEdges) as
struct-of-arrays folds. The x running-mean and the y0-gap gating are
order-sensitive left-folds over textlines in reading order, so the scan
is sequential per document; all state lives in flat numpy arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# `camelot/core.py:16`: a textedge is valid after >4 intersections.
TEXTEDGE_REQUIRED_ELEMENTS = 4
# `camelot/core.py:18`: padding applied to detected table areas.
TABLE_AREA_PADDING = 10

ALIGNS = ("left", "right", "middle")


class EdgeState:
    """Flat-array registry of text edges for one alignment."""

    __slots__ = ("x", "y0", "y1", "intersections")

    def __init__(self) -> None:
        self.x: list[float] = []
        self.y0: list[float] = []
        self.y1: list[float] = []
        self.intersections: list[int] = []

    def as_frame(self) -> pd.DataFrame:
        inter = np.asarray(self.intersections, dtype=np.int64)
        return pd.DataFrame(
            {
                "x": np.asarray(self.x, dtype=np.float64),
                "y0": np.asarray(self.y0, dtype=np.float64),
                "y1": np.asarray(self.y1, dtype=np.float64),
                "intersections": inter,
                "is_valid": inter > TEXTEDGE_REQUIRED_ELEMENTS,
            }
        )


def generate_textedges(tl: pd.DataFrame, edge_tol: float = 50) -> dict[str, pd.DataFrame]:
    """Accumulate left/right/middle edges over reading-ordered textlines.

    Semantics per `camelot/core.py:98-135`: for each line with >1 char
    of stripped text, per alignment find the first edge with
    ``isclose(edge.x, x, atol=0.5)``; if none, register a new edge; if
    found *and* ``isclose(edge.y0, y0, atol=edge_tol)``, extend it:
    running-mean x, y0 := line y0, intersections += 1. A found-but-too-
    far edge is left untouched (reference quirk — no new edge created).
    """
    states = {a: EdgeState() for a in ALIGNS}
    keep = tl["text"].str.strip().str.len().fillna(0).to_numpy() > 1  # core.py:134
    x0s = tl["x0"].to_numpy()
    x1s = tl["x1"].to_numpy()
    y0s = tl["y0"].to_numpy()
    y1s = tl["y1"].to_numpy()
    for i in np.flatnonzero(keep):
        xs = {
            "left": x0s[i],
            "right": x1s[i],
            "middle": x0s[i] + (x1s[i] - x0s[i]) / 2.0,
        }
        for align in ALIGNS:
            st = states[align]
            x_coord = xs[align]
            ex = np.asarray(st.x, dtype=np.float64)
            hits = np.flatnonzero(np.isclose(ex, x_coord, atol=0.5))
            if hits.size == 0:
                st.x.append(float(x_coord))
                st.y0.append(float(y0s[i]))
                st.y1.append(float(y1s[i]))
                st.intersections.append(0)
            else:
                j = int(hits[0])
                if np.isclose(st.y0[j], y0s[i], atol=edge_tol):
                    n = st.intersections[j]
                    st.x[j] = (n * st.x[j] + x_coord) / float(n + 1)
                    st.y0[j] = float(y0s[i])
                    st.intersections[j] = n + 1
    return {a: states[a].as_frame() for a in ALIGNS}


def relevant_align(edges: dict[str, pd.DataFrame]) -> str:
    """Alignment whose valid edges intersect the most — `core.py:137-158`.

    Ties resolve in dict insertion order left → right → middle.
    """
    best_align, best_sum = "left", -1
    for align in ALIGNS:
        f = edges[align]
        s = int(f.loc[f["is_valid"], "intersections"].sum())
        if s > best_sum:
            best_align, best_sum = align, s
    return best_align


def table_areas(
    tl: pd.DataFrame, relevant: pd.DataFrame
) -> list[tuple[float, float, float, float]]:
    """Sweep valid edges into areas, extend with overlapping textlines,
    pad — `camelot/core.py:160-231`.

    Areas are kept as an ordered list (reference dict preserves
    insertion order); "first overlapping area" search order matters.
    """
    if len(tl) == 0:
        return []
    rel = relevant.sort_values(["y0", "x"], ascending=[False, True], kind="stable")

    areas: list[list[float]] = []
    for e in rel.itertuples():
        if not e.is_valid:
            continue
        if not areas:
            areas.append([e.x, e.y0, e.x, e.y1])
            continue
        found = None
        for k, area in enumerate(areas):
            if e.y1 >= area[1] and e.y0 <= area[3]:
                found = k
                break
        if found is None:
            areas.append([e.x, e.y0, e.x, e.y1])
        else:
            a = areas.pop(found)
            # reference re-inserts the updated area at the dict's end
            areas.append([a[0], min(e.y0, a[1]), max(a[2], e.x), max(a[3], e.y1)])

    # extend with any textline vertically inside an area (core.py:206-223)
    sum_h = 0.0
    x0s = tl["x0"].to_numpy()
    y0s = tl["y0"].to_numpy()
    x1s = tl["x1"].to_numpy()
    y1s = tl["y1"].to_numpy()
    for i in range(len(tl)):
        sum_h += y1s[i] - y0s[i]
        found = None
        for k, area in enumerate(areas):
            if y0s[i] >= area[1] and y1s[i] <= area[3]:
                found = k
                break
        if found is not None:
            a = areas.pop(found)
            areas.append(
                [min(x0s[i], a[0]), min(y0s[i], a[1]), max(a[2], x1s[i]), max(a[3], y1s[i])]
            )
    avg_h = sum_h / float(len(tl))

    return [
        (
            a[0] - TABLE_AREA_PADDING,
            a[1] - TABLE_AREA_PADDING,
            a[2] + TABLE_AREA_PADDING,
            a[3] + avg_h * 5,  # headers sit above the detected edges
        )
        for a in areas
    ]
