"""Rotation detection + page-unrotation coordinate transforms.

Re-derives `camelot/utils.py:286-314` (``get_rotation``) and the page
rotation fix from `camelot/handlers.py:117-136`: where the reference
physically rewrites the PDF page (PyPDF2 rotate then re-parse), we
transform span coordinates in-kernel and swap text_h↔text_v kinds.

Conventions (bottom-left-origin PDF space, page W×H):
- content rotated clockwise 90°:  (x, y) ↦ (y, W − x), dims (H, W)
- content rotated anticlockwise:  (x, y) ↦ (H − y, x), dims (H, W)
The fixes below invert those maps.
"""

from __future__ import annotations

import numpy as np

from .textlines import TL


def detect_rotation(chars_m: np.ndarray, n_horizontal: int, n_vertical: int) -> str:
    """'' | 'clockwise' | 'anticlockwise' — `camelot/utils.py:286-314`.

    ``chars_m``: (N, 2) array of per-char CTM (b, c) components. Only
    checked when vertical lines outnumber horizontal ones; the majority
    CTM sign pattern decides the direction.
    """
    if n_horizontal >= n_vertical:
        return ""
    m = np.asarray(chars_m, dtype=np.float64).reshape(-1, 2)
    clockwise = int(((m[:, 0] < 0) & (m[:, 1] > 0)).sum())
    anticlockwise = int(((m[:, 0] > 0) & (m[:, 1] < 0)).sum())
    return "anticlockwise" if clockwise < anticlockwise else "clockwise"


def _fix_points(x: np.ndarray, y: np.ndarray, rotation: str, width: float, height: float):
    """Unrotate points on a rotated page of dims (width, height)."""
    if rotation == "clockwise":
        # inverse of (x,y) ↦ (y, W−x): (x', y') ↦ (H' − y', x')
        return height - y, x
    # inverse of (x,y) ↦ (H−y, x): (x', y') ↦ (y', W' − x')
    return y, width - x


def unrotate_bboxes(
    boxes: np.ndarray, rotation: str, width: float, height: float
) -> np.ndarray:
    """Unrotate (N,4) bboxes (x0,y0,x1,y1); result re-normalized so
    x0<x1, y0<y1. New page dims are (height, width)."""
    b = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    ax, ay = _fix_points(b[:, 0], b[:, 1], rotation, width, height)
    bx, by = _fix_points(b[:, 2], b[:, 3], rotation, width, height)
    return np.stack(
        [np.minimum(ax, bx), np.minimum(ay, by), np.maximum(ax, bx), np.maximum(ay, by)],
        axis=1,
    )


def unrotate_textlines(tl: TL, rotation: str, width: float, height: float) -> TL:
    """Unrotate a TL (bboxes + member char boxes)."""
    if len(tl) == 0:
        return tl
    boxes = unrotate_bboxes(
        np.stack([tl.x0, tl.y0, tl.x1, tl.y1], axis=1), rotation, width, height
    )
    new_chars = []
    for chars in tl.chars:
        if not chars:
            new_chars.append(chars)
            continue
        fixed = []
        for ch in chars:
            if "x0" not in ch:
                fixed.append(ch)
                continue
            cb = unrotate_bboxes(
                np.array([[ch["x0"], ch["y0"], ch["x1"], ch["y1"]]]), rotation, width, height
            )[0]
            nch = dict(ch)
            nch["x0"], nch["y0"], nch["x1"], nch["y1"] = map(float, cb)
            fixed.append(nch)
        new_chars.append(fixed)
    return TL(
        boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
        list(tl.text), new_chars, tl.offset.copy(),
    )


def unrotate_segments(seg: np.ndarray, rotation: str, width: float, height: float) -> np.ndarray:
    """Unrotate (N,4) segments; endpoints normalized min→max per axis."""
    return unrotate_bboxes(seg, rotation, width, height)
