"""Cell-grid state as boolean matrices (replaces camelot's Cell objects).

The reference keeps a ``cells[r][c]`` object grid with per-cell edge
booleans and walks it with nested loops (`camelot/core.py:234-569`).
Here the grid is four (nrows, ncols) boolean matrices L/R/T/B plus
hspan/vspan matrices and an object array of cell texts; edge marking
becomes strided slice assignment.
"""

from __future__ import annotations

import numpy as np


class Grid:
    """Table grid over ``cols`` (x asc) and ``rows`` (y desc) intervals —
    mirrors `camelot/core.py:342-345`."""

    def __init__(self, cols: list[tuple[float, float]], rows: list[tuple[float, float]]):
        self.cols = [(float(a), float(b)) for a, b in cols]
        self.rows = [(float(a), float(b)) for a, b in rows]
        # cached coordinate arrays (hot path: per-textline assignment)
        self.col_l = np.asarray([c[0] for c in self.cols])
        self.col_r = np.asarray([c[1] for c in self.cols])
        self.row_t = np.asarray([r[0] for r in self.rows])
        self.row_b = np.asarray([r[1] for r in self.rows])
        nr, nc = len(rows), len(cols)
        self.nrows, self.ncols = nr, nc
        self.left = np.zeros((nr, nc), dtype=bool)
        self.right = np.zeros((nr, nc), dtype=bool)
        self.top = np.zeros((nr, nc), dtype=bool)
        self.bottom = np.zeros((nr, nc), dtype=bool)
        self.hspan = np.zeros((nr, nc), dtype=bool)
        self.vspan = np.zeros((nr, nc), dtype=bool)
        # append-only text accumulation (`core.py:302-304`)
        self.text = np.full((nr, nc), "", dtype=object)

    # -- edge setting ------------------------------------------------------

    def set_all_edges(self) -> "Grid":
        """All edges true — `camelot/core.py:386-392` (Stream path)."""
        self.left[:] = self.right[:] = self.top[:] = self.bottom[:] = True
        return self

    def set_edges(self, vertical: np.ndarray, horizontal: np.ndarray, joint_tol: float = 2) -> "Grid":
        """Mark cell edges crossed by ruling segments — `core.py:394-527`.

        Replicates the reference's index-matching exactly, including the
        border-only special cases (segment matching no column → right
        edge of the last column, etc.) and the skip when the segment's
        leading coordinate aligns with no row/col.
        """
        col_lefts = self.col_l
        row_tops = self.row_t
        # np.isclose semantics (|a-b| <= atol + rtol*|b|, rtol=1e-5)
        # inlined: isclose's seterr/all machinery dominates this loop
        col_tol = joint_tol + 1.0e-5 * np.abs(col_lefts)
        row_tol = joint_tol + 1.0e-5 * np.abs(row_tops)

        def close_cols(val: float) -> np.ndarray:
            return np.flatnonzero(np.abs(val - col_lefts) <= col_tol)

        def close_rows(val: float) -> np.ndarray:
            return np.flatnonzero(np.abs(val - row_tops) <= row_tol)

        for v in np.asarray(vertical, dtype=np.float64).reshape(-1, 4):
            # v = (x, y_bottom, x, y_top) in PDF space
            i = close_cols(v[0])
            j = close_rows(v[3])
            k = close_rows(v[1])
            if j.size == 0:
                continue
            J = int(j[0])
            K = int(k[0]) if k.size else self.nrows
            if i.size == 1 and i[0] == 0:     # exactly [0] → only left edge of col 0
                self.left[J:K, 0] = True
            elif i.size == 0:                 # right edge of last col
                self.right[J:K, self.ncols - 1] = True
            else:                             # interior: left of col i, right of col i-1
                L = int(i[0])
                self.left[J:K, L] = True
                self.right[J:K, L - 1] = True  # L==0 wraps to last col, as in reference

        for h in np.asarray(horizontal, dtype=np.float64).reshape(-1, 4):
            # h = (x_left, y, x_right, y)
            i = close_rows(h[1])
            j = close_cols(h[0])
            k = close_cols(h[2])
            if j.size == 0:
                continue
            J = int(j[0])
            K = int(k[0]) if k.size else self.ncols
            if i.size == 1 and i[0] == 0:     # exactly [0] → only top edge of row 0
                self.top[0, J:K] = True
            elif i.size == 0:                 # bottom edge of last row
                self.bottom[self.nrows - 1, J:K] = True
            else:
                L = int(i[0])
                self.top[L, J:K] = True
                self.bottom[L - 1, J:K] = True  # L==0 wraps to last row, as in reference
        return self

    def set_border(self) -> "Grid":
        """Outer border — `camelot/core.py:529-538`."""
        self.left[:, 0] = True
        self.right[:, -1] = True
        self.top[0, :] = True
        self.bottom[-1, :] = True
        return self

    def set_span(self) -> "Grid":
        """hspan/vspan truth table — `camelot/core.py:540-569`.

        Elementwise boolean algebra over the bound count.
        """
        L, R, T, B = self.left, self.right, self.top, self.bottom
        bound = L.astype(np.int8) + R + T + B
        b3 = bound == 3
        self.hspan |= b3 & ((~L & R & T & B) | (~R & L & T & B))
        self.vspan |= b3 & ((~T & L & R & B) | (~B & L & R & T))
        b2 = bound == 2
        self.vspan |= b2 & L & R & ~T & ~B
        self.hspan |= b2 & T & B & ~L & ~R
        b01 = bound <= 1
        self.hspan |= b01
        self.vspan |= b01
        return self

    # -- text --------------------------------------------------------------

    def append_text(self, r: int, c: int, t: str) -> None:
        """Append-only cell text setter (`core.py:302-304`); negative
        indices wrap like Python lists, preserving the reference's
        cells[-1][-1] fallthrough for unassigned lines."""
        self.text[r, c] = self.text[r, c] + t

    def data(self) -> list[list[str]]:
        """2-D list of stripped strings — `camelot/core.py:363-370`."""
        return [[self.text[r, c].strip() for c in range(self.ncols)] for r in range(self.nrows)]
