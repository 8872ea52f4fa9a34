"""Stream flavor: whitespace-gap text-alignment table extraction.

Re-derives `camelot/parsers/stream.py` end-to-end over the array page
model: Nurminen textedge detection (P1), row/column inference (P2) and
table build (P3/P4). All geometry work is vectorized numpy; the few
order-sensitive folds (row grouping, textedge accumulation, interval
merging) are sequential scans per document as the reference semantics
require.
"""

from __future__ import annotations

import warnings

import numpy as np

from ..config import StreamConfig
from ..kernels import cols as colk
from ..kernels import rows as rowk
from ..kernels import textedges as tek
from ..kernels import textlines as tlk
from ..kernels.grid import Grid
from ..kernels.textlines import TL
from .common import TableResult, assign_text, finish_table
from .page import Page, parse_area_strings


def _nurminen_table_detection(textlines: TL, edge_tol: float, width: float, height: float):
    """`camelot/parsers/stream.py:267-290`: textedges → relevant align →
    table areas; whole page as fallback."""
    tl = tlk.sort_reading_order(textlines)
    edges = tek.generate_textedges(tl, edge_tol=edge_tol)
    relevant = edges[tek.relevant_align(edges)]
    areas = tek.table_areas(tl, relevant)
    if not areas:
        areas = [(0.0, 0.0, float(width), float(height))]
    return areas


def _generate_table_bbox(page: Page, cfg: StreamConfig):
    """`camelot/parsers/stream.py:292-318`."""
    if cfg.table_areas is None:
        hor_text = page.horizontal_text
        if cfg.table_regions is not None:
            # per-region concatenation, duplicates included — a line in
            # two regions appears twice, as in `stream.py:298-306`
            keep_order: list[int] = []
            for bbox in parse_area_strings(cfg.table_regions):
                keep_order.extend(
                    np.flatnonzero(tlk.text_in_bbox_mask(bbox, page.horizontal_text))
                )
            hor_text = page.horizontal_text.take(np.asarray(keep_order, dtype=np.int64))
        return _nurminen_table_detection(hor_text, cfg.edge_tol, page.width, page.height)
    return parse_area_strings(cfg.table_areas)


def _generate_columns_and_rows(page: Page, cfg: StreamConfig, table_idx: int, tk: tuple):
    """`camelot/parsers/stream.py:320-387`."""
    h = tlk.sort_reading_order(tlk.text_in_bbox(tk, page.horizontal_text))
    v = tlk.sort_vertical_order(tlk.text_in_bbox(tk, page.vertical_text))
    t_bbox = {"horizontal": h, "vertical": v}
    text_x_min, text_y_min, text_x_max, text_y_max = tlk.text_bbox([h, v])
    row_groups = rowk.group_rows_indices(h, row_tol=cfg.row_tol)
    rows = rowk.join_rows(row_groups, h, text_y_max, text_y_min)
    elements = [len(g) for g in row_groups]

    if cfg.columns is not None and cfg.columns[table_idx] != "":
        cols_c = [float(c) for c in cfg.columns[table_idx].split(",")]
        cols_c.insert(0, text_x_min)
        cols_c.append(text_x_max)
        cols = [(cols_c[i], cols_c[i + 1]) for i in range(len(cols_c) - 1)]
    else:
        cols = colk.infer_columns(
            row_groups,
            elements,
            h,
            v,
            text_x_min,
            text_x_max,
            cfg.row_tol,
            cfg.column_tol,
            table_label=str(table_idx + 1),
        )
    return cols, rows, t_bbox


def extract_stream(page: Page, cfg: StreamConfig) -> list[TableResult]:
    """`camelot/parsers/stream.py:434-463` per document."""
    if len(page.horizontal_text) == 0:
        if page.media:
            warnings.warn("document is image-based, stream works on text-based pages")
        else:
            warnings.warn("No tables found on document")
        return []

    table_bbox = _generate_table_bbox(page, cfg)

    tables: list[TableResult] = []
    for table_idx, tk in enumerate(sorted(table_bbox, key=lambda b: b[1], reverse=True)):
        cols, rows, t_bbox = _generate_columns_and_rows(page, cfg, table_idx, tk)
        grid = Grid(cols, rows).set_all_edges()
        pos_errors = assign_text(
            grid,
            t_bbox,
            split_text=cfg.split_text,
            flag_size=cfg.flag_size,
            strip_text=cfg.strip_text,
        )
        tables.append(finish_table(grid, pos_errors, table_idx + 1, tk, "stream"))
    return tables
