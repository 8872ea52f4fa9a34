"""Row clustering and row-boundary construction (Stream flavor).

Re-derives `camelot/parsers/stream.py:105-137` (``_group_rows``) and
`:183-208` (``_join_rows``) as array scans. The grouping is an
anchor-gated 1-D clustering: a new row starts when the line's y0 is not
within ``row_tol`` of the *first* line of the current group (the
reference's ``row_y`` only changes at group breaks), so it is an
order-sensitive fold, kept sequential over the (few) lines of a page.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def group_rows_labels(tl: pd.DataFrame, row_tol: float = 2) -> np.ndarray:
    """Assign a row label to each textline, -1 for excluded lines.

    Input must already be in reading order ``(-y0, x0)``. Blank lines
    are skipped entirely (`stream.py:129`). The first emitted group is
    discarded (`stream.py:136`), which with the ``row_y = 0`` seed is
    normally the empty bootstrap group — we replicate the exact fold:
    labels returned here are the *kept* group ids (0-based) or -1.
    """
    n = len(tl)
    labels = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return labels
    y0 = tl["y0"].to_numpy()
    blank = tl["text"].str.strip().str.len().fillna(0).to_numpy() == 0
    row_y = 0.0
    group = -1  # the bootstrap group; popped by reference
    for i in range(n):
        if blank[i]:
            continue
        if not np.isclose(row_y, y0[i], atol=row_tol):
            group += 1
            row_y = y0[i]
        labels[i] = group
    # reference pops rows[0]: group 0 here corresponds to rows[1] there
    # only when the bootstrap group was non-empty. The bootstrap group is
    # non-empty iff the first non-blank line had y0 within row_tol of 0,
    # in which case those lines are discarded.
    first_group_discarded = labels[(~blank) & (labels == -1)]
    # lines that stayed in group -1 (bootstrap) are already -1 → dropped,
    # matching the reference pop. Nothing else to do.
    del first_group_discarded
    return labels


def group_rows(tl: pd.DataFrame, row_tol: float = 2) -> list[pd.DataFrame]:
    """Two-dimensional grouping mirroring ``_group_rows`` output: a list
    of row frames, each sorted by x0 (`stream.py:131`)."""
    labels = group_rows_labels(tl, row_tol=row_tol)
    out = []
    ngroups = labels.max() + 1 if len(labels) else 0
    for g in range(ngroups):
        rows = tl[labels == g]
        out.append(rows.sort_values("x0", kind="stable").reset_index(drop=True))
    return out


def join_rows(
    rows_grouped: list[pd.DataFrame], text_y_max: float, text_y_min: float
) -> list[tuple[float, float]]:
    """Continuous row y-intervals — `camelot/parsers/stream.py:183-208`.

    Row mid = mean of line midlines per group; boundaries = midpoints of
    successive row mids, capped by the text bbox extremes.
    """
    row_mids = [
        float(((r["y0"].to_numpy() + r["y1"].to_numpy()) / 2.0).sum() / len(r))
        if len(r) > 0
        else 0.0
        for r in rows_grouped
    ]
    bounds = [(row_mids[i] + row_mids[i - 1]) / 2.0 for i in range(1, len(row_mids))]
    bounds.insert(0, text_y_max)
    bounds.append(text_y_min)
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]
