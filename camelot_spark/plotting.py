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


def plot_geometry(geom: dict, kind: str = "text", ax=None):
    """Render one overlay kind ('text' | 'grid' | 'contour' |
    'textedge' | 'joint' | 'line') — mirrors `camelot/plotting.py`
    dispatch, including the flavor validation of `PlotMethods.__call__`
    (`plotting.py:36-43`): textedge is stream-only, joint/line are
    lattice-only."""
    flavor = geom.get("flavor")
    if flavor == "lattice" and kind == "textedge":
        raise NotImplementedError(f"Lattice flavor does not support kind='{kind}'")
    if flavor == "stream" and kind in ("joint", "line"):
        raise NotImplementedError(f"Stream flavor does not support kind='{kind}'")
    try:
        import matplotlib.patches as patches
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover - env without matplotlib
        raise ImportError(
            "matplotlib is required for plot_geometry; debug_geometry "
            "output is plain data and can be rendered elsewhere"
        ) from e

    if ax is None:
        _, ax = plt.subplots()
    ax.set_xlim(0, geom["width"])
    ax.set_ylim(0, geom["height"])

    if kind == "text":
        for (x0, y0, x1, y1) in geom["text"]:
            ax.add_patch(patches.Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False, color="blue"))
    elif kind == "grid":
        for t in geom.get("cells", []):
            for (x0, y0, x1, y1) in t["rects"]:
                ax.add_patch(patches.Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False, color="purple"))
    elif kind == "textedge":
        for te in geom.get("textedges", []):
            if te["is_valid"]:
                ax.plot([te["x"], te["x"]], [te["y0"], te["y1"]], color="red")
    elif kind == "contour":
        for area in geom.get("table_areas", []) or [t["bbox"] for t in geom.get("tables", [])]:
            x0, y0, x1, y1 = area
            ax.add_patch(patches.Rectangle((x0, y0), x1 - x0, y1 - y0, fill=False, color="green"))
    elif kind == "joint":
        xs = [j[0] for t in geom.get("tables", []) for j in t["joints"]]
        ys = [j[1] for t in geom.get("tables", []) for j in t["joints"]]
        ax.plot(xs, ys, "ro", markersize=3)
    elif kind == "line":
        segs = geom.get("segments", {})
        for (x0, y0, x1, y1) in segs.get("vertical", []) + segs.get("horizontal", []):
            ax.plot([x0, x1], [y0, y1], color="black")
    else:
        raise NotImplementedError(f"unknown plot kind {kind!r}")
    return ax
