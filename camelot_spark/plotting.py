"""Debug-geometry collection + optional matplotlib overlays (§2.8).

Reference: ``camelot.plot`` / ``PlotMethods`` (`camelot/plotting.py:12-223`)
draw text bboxes, cell grids, contours, textedges, joints and segments
over a parsed page. The Spark-idiomatic equivalent is two-step:

1. ``debug_geometry(spans, flavor, **kwargs)`` — pure computation,
   runs anywhere (driver-side on a collected sample doc, or inside a
   kernel) and returns plain dicts of the same overlay data the
   reference stores on ``table._text/_image/_segments/_textedges``
   (`camelot/parsers/stream.py:424-430`, `lattice.py:376-382`).
2. ``plot_geometry(geom, kind)`` — renders with matplotlib when it is
   installed (it is not in this environment; the data path is tested,
   the render path degrades with a clear ImportError).

Typical use::

    row = extracted.where(F.col("doc_id") == X).collect()[0]   # sample
    doc = documents.where(...).collect()[0]
    geom = debug_geometry(list(doc["spans"]), flavor="stream")
    plot_geometry(geom, kind="textedge")
"""

from __future__ import annotations

from .config import make_config
from .kernels import textedges as tek
from .kernels import textlines as tlk
from .parsers.page import parse_page


def _tl_boxes(tl) -> list[tuple[float, float, float, float]]:
    return [
        (float(x0), float(y0), float(x1), float(y1))
        for x0, y0, x1, y1 in zip(tl.x0, tl.y0, tl.x1, tl.y1)
    ]


def debug_geometry(spans: list[dict], flavor: str = "stream", **kwargs) -> dict:
    """Overlay data for one document: text boxes always; flavor-specific
    textedges/areas (stream) or segments/joints/tables (lattice); plus
    per-table cell rectangles (the reference's ``grid`` plot,
    `camelot/plotting.py:81-111`, draws ``table.cells`` — here the
    cols×rows interval product of each extracted table)."""
    from .extract_doc import extract_document

    cfg = make_config(flavor, **kwargs)
    page = parse_page(spans, layout_kwargs=cfg.layout_kwargs)
    geom: dict = {
        "width": page.width,
        "height": page.height,
        "rotation": page.rotation,
        "text": _tl_boxes(page.horizontal_text) + _tl_boxes(page.vertical_text),
        "flavor": flavor,
    }
    if flavor == "stream":
        tl = tlk.sort_reading_order(page.horizontal_text)
        edges = tek.generate_textedges(tl, edge_tol=cfg.edge_tol)
        geom["textedges"] = [
            {
                "align": align,
                "x": float(st.x[j]),
                "y0": float(st.y0[j]),
                "y1": float(st.y1[j]),
                "intersections": int(st.intersections[j]),
                "is_valid": st.intersections[j] > tek.TEXTEDGE_REQUIRED_ELEMENTS,
            }
            for align in tek.ALIGNS
            for st in (edges[align],)
            for j in range(len(st.x))
        ]
        relevant = edges[tek.relevant_align(edges)]
        geom["table_areas"] = [tuple(map(float, a)) for a in tek.table_areas(tl, relevant)]
    else:
        from .parsers.lattice import _generate_table_bbox

        table_bbox, v, h = _generate_table_bbox(page, cfg)
        geom["segments"] = {
            "vertical": [tuple(map(float, s)) for s in v],
            "horizontal": [tuple(map(float, s)) for s in h],
        }
        geom["tables"] = [
            {"bbox": tuple(map(float, tk)), "joints": [tuple(map(float, j)) for j in js]}
            for tk, js in table_bbox.items()
        ]
    # grid overlay: cell rectangles of every extracted table
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        res = extract_document(spans, cfg)
    geom["cells"] = [
        {
            "table_order": t.order,
            "rects": [
                (float(cl), float(rb), float(cr), float(rt))
                for (rt, rb) in (t.rows or [])
                for (cl, cr) in (t.cols or [])
            ],
        }
        for t in res["tables"]
    ]
    return geom


PLOT_KINDS = ("text", "grid", "contour", "textedge", "joint", "line")


def _validate_kind(geom: dict, kind: str) -> None:
    """`PlotMethods.__call__` flavor validation (`camelot/plotting.py:36-43`):
    textedge is stream-only, joint/line are lattice-only."""
    flavor = geom.get("flavor")
    if flavor == "lattice" and kind == "textedge":
        raise NotImplementedError(f"Lattice flavor does not support kind='{kind}'")
    if flavor == "stream" and kind in ("joint", "line"):
        raise NotImplementedError(f"Stream flavor does not support kind='{kind}'")
    if kind not in PLOT_KINDS:
        raise NotImplementedError(f"unknown plot kind {kind!r}")


def _overlay_shapes(geom: dict, kind: str):
    """One overlay kind → primitive draw ops (rect/line/point lists in
    page coordinates) — the single source both renderers consume."""
    rects: list[tuple[float, float, float, float]] = []
    lines: list[tuple[float, float, float, float]] = []
    points: list[tuple[float, float]] = []
    if kind == "text":
        rects = list(geom["text"])
    elif kind == "grid":
        rects = [r for t in geom.get("cells", []) for r in t["rects"]]
    elif kind == "textedge":
        lines = [
            (te["x"], te["y0"], te["x"], te["y1"])
            for te in geom.get("textedges", [])
            if te["is_valid"]
        ]
    elif kind == "contour":
        rects = list(geom.get("table_areas", [])) or [
            t["bbox"] for t in geom.get("tables", [])
        ]
    elif kind == "joint":
        points = [tuple(j) for t in geom.get("tables", []) for j in t["joints"]]
    elif kind == "line":
        segs = geom.get("segments", {})
        lines = list(segs.get("vertical", [])) + list(segs.get("horizontal", []))
    return rects, lines, points


def render_geometry(geom: dict, kind: str = "text", ink: int = 0) -> "np.ndarray":
    """Zero-dependency raster render of one overlay kind → (H, W) uint8
    canvas (255 = paper, ``ink`` = overlay), PDF y-up flipped to image
    rows. Pairs with ``tdp.png_codec.encode_png`` for savable debug
    images in environments without matplotlib (this one)."""
    import numpy as np

    _validate_kind(geom, kind)
    w, h = int(round(geom["width"])), int(round(geom["height"]))
    canvas = np.full((max(h, 1), max(w, 1)), 255, dtype=np.uint8)

    def px(x: float, y: float) -> tuple[int, int]:
        c = min(max(int(round(x)), 0), canvas.shape[1] - 1)
        r = min(max(int(round(y)), 0), canvas.shape[0] - 1)
        return canvas.shape[0] - 1 - r, c  # flip y-up → row

    def draw_line(x0, y0, x1, y1):
        n = int(max(abs(x1 - x0), abs(y1 - y0))) * 2 + 2
        import numpy as _np

        for t in _np.linspace(0.0, 1.0, n):
            r, c = px(x0 + (x1 - x0) * t, y0 + (y1 - y0) * t)
            canvas[r, c] = ink

    rects, lines, points = _overlay_shapes(geom, kind)
    for (x0, y0, x1, y1) in rects:
        draw_line(x0, y0, x1, y0)
        draw_line(x0, y1, x1, y1)
        draw_line(x0, y0, x0, y1)
        draw_line(x1, y0, x1, y1)
    for (x0, y0, x1, y1) in lines:
        draw_line(x0, y0, x1, y1)
    for (x, y) in points:
        r, c = px(x, y)
        canvas[max(r - 1, 0):r + 2, max(c - 1, 0):c + 2] = ink
    return canvas


def save_debug_png(geom: dict, kind: str, path: str) -> None:
    """Render one overlay kind and write a real PNG (pure-stdlib codec)."""
    from .tdp.png_codec import encode_png

    with open(path, "wb") as f:
        f.write(encode_png(render_geometry(geom, kind)))


def plot_geometry(geom: dict, kind: str = "text", ax=None):
    """Render one overlay kind ('text' | 'grid' | 'contour' |
    'textedge' | 'joint' | 'line') — mirrors `camelot/plotting.py`
    dispatch and flavor validation. Uses matplotlib when installed;
    otherwise falls back to the built-in rasterizer and returns the
    uint8 canvas (``render_geometry``)."""
    _validate_kind(geom, kind)
    try:
        import matplotlib.patches as patches
        import matplotlib.pyplot as plt
    except ImportError:
        return render_geometry(geom, kind)

    if ax is None:
        _, ax = plt.subplots()
    ax.set_xlim(0, geom["width"])
    ax.set_ylim(0, geom["height"])
    colors = {"text": "blue", "grid": "purple", "textedge": "red",
              "contour": "green", "joint": "red", "line": "black"}
    rects, lines, points = _overlay_shapes(geom, kind)
    for (x0, y0, x1, y1) in rects:
        ax.add_patch(
            patches.Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False, color=colors[kind])
        )
    for (x0, y0, x1, y1) in lines:
        ax.plot([x0, x1], [y0, y1], color=colors[kind])
    if points:
        ax.plot([p[0] for p in points], [p[1] for p in points], "ro", markersize=3)
    return ax
