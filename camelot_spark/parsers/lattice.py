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


def _raster_tables(page: Page, cfg: LatticeConfig):
    """Raster path (L1-L4): media bitmaps → masks → centerline segments
    → contour/joint tables, all mapped back to PDF space. Mirrors
    `camelot/parsers/lattice.py:224-296` with the numpy kernels in
    `kernels/raster.py` replacing cv2."""
    from ..kernels import raster as rk

    tables_pdf: dict = {}
    v_parts, h_parts = [], []
    for m in page.media:
        if not m.bitmap:
            continue
        img = rk.decode_bitmap(m.bitmap)
        img_h, img_w = img.shape
        thr = rk.adaptive_threshold(
            img,
            process_background=cfg.process_background,
            blocksize=cfg.threshold_blocksize,
            c=cfg.threshold_constant,
        )
        regions_img = None
        if cfg.table_regions is not None:
            # PDF rects → image rects (scale_pdf, `utils.py:159-198`)
            sx, sy = img_w / page.width, img_h / page.height
            regions_img = [
                (int(x0 * sx), int((page.height - y1) * sy),
                 int((x1 - x0) * sx), int((y1 - y0) * sy))
                for (x0, y0, x1, y1) in parse_area_strings(cfg.table_regions)
            ]
        vmask, vlines = rk.find_lines(
            thr, regions_img, "vertical", cfg.line_scale, cfg.iterations
        )
        hmask, hlines = rk.find_lines(
            thr, regions_img, "horizontal", cfg.line_scale, cfg.iterations
        )
        if cfg.table_areas is None:
            contours = rk.find_contours(vmask, hmask)
            tables_img = rk.find_joints(contours, vmask, hmask)
        else:
            # user areas are applied downstream in PDF space (joint
            # filter), same outcome as the reference's scale_pdf areas
            tables_img = {}
        tpdf, vpdf, hpdf = rk.scale_image_to_pdf(
            tables_img, vlines, hlines, page.width, page.height, img_w, img_h
        )
        tables_pdf.update(tpdf)
        v_parts.append(vpdf)
        h_parts.append(hpdf)
    return tables_pdf, v_parts, h_parts


def _generate_table_bbox(page: Page, cfg: LatticeConfig):
    """`camelot/parsers/lattice.py:224-296`; segment or raster path per
    media payload (both feed the same downstream grid build)."""
    v, h = _gather_segments(page)
    if cfg.table_regions is not None:
        regions = parse_area_strings(cfg.table_regions)
        v = _clip_segments_to_regions(v, regions, "v")
        h = _clip_segments_to_regions(h, regions, "h")

    raster_tables, r_v, r_h = _raster_tables(page, cfg)
    if r_v:
        v = np.concatenate([v] + r_v)
        h = np.concatenate([h] + r_h)

    if cfg.table_areas is None:
        if raster_tables or any(m.bitmap for m in page.media):
            table_bbox = raster_tables
        else:
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
