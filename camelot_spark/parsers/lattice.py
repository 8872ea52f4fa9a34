"""Lattice flavor: ruling-line grid table extraction (segment path).

Re-derives `camelot/parsers/lattice.py` over pre-extracted ruling
segments carried by ``media`` spans (FIXTURES.md §1). The reference's
raster stages (ghostscript render `lattice.py:211-221`, adaptive
threshold + cv2 morphology `image_processing.py:9-135`) are replaced by
geometric crossing detection in numpy (`kernels/lines.py`), which
yields the same joints / table bboxes for ruled tables; the ≤4-joint
drop and 10-table cap are preserved. A raster path can slot in behind
the same interface if cv2 is available (not in this environment).
"""

from __future__ import annotations

import warnings

import numpy as np

from ..config import LatticeConfig
from ..kernels import lines as lnk
from ..kernels import textlines as tlk
from ..kernels.assign import copy_spanning_text
from ..kernels.grid import Grid
from .common import TableResult, assign_text, finish_table
from .page import Page, parse_area_strings


def _gather_segments(page: Page) -> tuple[np.ndarray, np.ndarray]:
    vs = [m.segments_v for m in page.media if len(m.segments_v)]
    hs = [m.segments_h for m in page.media if len(m.segments_h)]
    v = np.concatenate(vs) if vs else np.empty((0, 4))
    h = np.concatenate(hs) if hs else np.empty((0, 4))
    return v, h


def _clip_segments_to_regions(
    seg: np.ndarray, regions: list[tuple], axis: str
) -> np.ndarray:
    """Region pre-filter: clip segments to region rects, the geometric
    analog of zeroing pixels outside regions (`image_processing.py:105-110`)."""
    if not len(seg):
        return seg
    out = []
    for s in seg:
        for (x0, y0, x1, y1) in regions:
            if axis == "v":
                if x0 <= s[0] <= x1:
                    lo, hi = max(min(s[1], s[3]), y0), min(max(s[1], s[3]), y1)
                    if hi > lo:
                        out.append((s[0], lo, s[2], hi))
                        break
            else:
                if y0 <= s[1] <= y1:
                    lo, hi = max(min(s[0], s[2]), x0), min(max(s[0], s[2]), x1)
                    if hi > lo:
                        out.append((lo, s[1], hi, s[3]))
                        break
    return np.asarray(out, dtype=np.float64).reshape(-1, 4)


def _generate_table_bbox(page: Page, cfg: LatticeConfig):
    """`camelot/parsers/lattice.py:224-296` on the segment path."""
    v, h = _gather_segments(page)
    if cfg.table_regions is not None:
        regions = parse_area_strings(cfg.table_regions)
        v = _clip_segments_to_regions(v, regions, "v")
        h = _clip_segments_to_regions(h, regions, "h")

    if cfg.table_areas is None:
        table_bbox = lnk.segment_tables(v, h, tol=cfg.joint_tol)
    else:
        joints, _, _ = lnk.segment_joints(v, h, tol=cfg.joint_tol)
        table_bbox = {}
        for bbox in parse_area_strings(cfg.table_areas):
            if len(joints):
                m = (
                    (joints[:, 0] >= bbox[0])
                    & (joints[:, 0] <= bbox[2])
                    & (joints[:, 1] >= bbox[1])
                    & (joints[:, 1] <= bbox[3])
                )
                js = [(float(x), float(y)) for x, y in joints[m]]
            else:
                js = []
            # find_joints drops areas with <= 4 joints (`image_processing.py:215`)
            if len(js) <= lnk.MIN_JOINTS_PER_TABLE:
                continue
            table_bbox[bbox] = js
    return table_bbox, v, h


def extract_lattice(page: Page, cfg: LatticeConfig) -> list[TableResult]:
    """`camelot/parsers/lattice.py:386-416` per document."""
    if len(page.horizontal_text) == 0:
        if page.media:
            warnings.warn("document is image-based, lattice works on text-based pages")
        else:
            warnings.warn("No tables found on document")
        return []

    table_bbox, v_all, h_all = _generate_table_bbox(page, cfg)

    tables: list[TableResult] = []
    for table_idx, tk in enumerate(sorted(table_bbox, key=lambda b: b[1], reverse=True)):
        joints = table_bbox[tk]
        cols, rows = lnk.grid_intervals(tk, joints, line_tol=cfg.line_tol)
        v_s, h_s = tlk.segments_in_bbox(tk, v_all, h_all)
        t_bbox = {
            "horizontal": tlk.sort_reading_order(tlk.text_in_bbox(tk, page.horizontal_text)),
            "vertical": tlk.sort_vertical_order(tlk.text_in_bbox(tk, page.vertical_text)),
        }
        grid = Grid(cols, rows)
        # vertical segments carry (x, y_bottom, x, y_top): set_edges expects
        # v[3]=top to locate the starting row (`core.py:415-419`)
        grid.set_edges(v_s, h_s, joint_tol=cfg.joint_tol)
        grid.set_border()
        grid.set_span()
        pos_errors = assign_text(
            grid,
            t_bbox,
            split_text=cfg.split_text,
            flag_size=cfg.flag_size,
            strip_text=cfg.strip_text,
            shift_text=cfg.shift_text,
        )
        if cfg.copy_text is not None:
            copy_spanning_text(grid, cfg.copy_text)
        tables.append(finish_table(grid, pos_errors, table_idx + 1, tk, "lattice"))
    return tables
