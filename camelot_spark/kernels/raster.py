"""Raster path for the Lattice flavor (L1-L4) — pure numpy, no cv2.

Re-derives `camelot/image_processing.py` over a page bitmap carried by
the ``media`` span (`media_ref` payload, FIXTURES.md §1):

- ``adaptive_threshold``      ← `image_processing.py:9-53`   (L1)
- ``find_lines``              ← `image_processing.py:56-135` (L2)
- ``find_contours``           ← `image_processing.py:138-175` (L3)
- ``find_joints``             ← `image_processing.py:178-224` (L4)
- ``scale_image_to_pdf``      ← `camelot/utils.py:159-283` + scaler
                                 setup `camelot/parsers/lattice.py:244-251` (L5)

cv2 isn't available in this environment, and a faithful translation
would be the wrong shape anyway: each operator below is vectorized
numpy over the whole bitmap (cumsum box filters, run-length morphology,
run-merge connected components) — per-pixel work never touches Python.

Image convention matches the reference raster: row 0 = top of the
page, x right / y down; PDF space is bottom-left-origin. All segment /
table outputs are integer pixel coords until ``scale_image_to_pdf``.

The local window is Gaussian-weighted by default, matching the
reference's `cv2.ADAPTIVE_THRESH_GAUSSIAN_C` (`image_processing.py:43`):
weights come from cv2's published sigma formula for large kernels
(sigma = 0.3·((k−1)·0.5 − 1) + 0.8, getGaussianKernel docs) as a
separable convolution with edge replication (cv2's BORDER_REPLICATE).
The round-1 box-mean window remains available via ``window="box"``
(identical decisions on clean two-level line art; diverges on
noisy/anti-aliased rasters, where Gaussian is the reference behavior).
"""

from __future__ import annotations

import numpy as np


def _box_mean(g: np.ndarray, k: int) -> np.ndarray:
    """k×k box-filter local mean via 2-D cumsum (edge-replicated pad)."""
    pad = k // 2
    p = np.pad(g, pad + 1, mode="edge").astype(np.float64)
    cs = p.cumsum(axis=0).cumsum(axis=1)
    H, W = g.shape
    # window sum at (i, j) over rows [i-pad, i+pad] etc. in padded coords
    a = cs[k:k + H, k:k + W]
    b = cs[0:H, k:k + W]
    c = cs[k:k + H, 0:W]
    d = cs[0:H, 0:W]
    return (a - b - c + d) / float(k * k)


def _gaussian_kernel(k: int) -> np.ndarray:
    """1-D normalized Gaussian, cv2.getGaussianKernel semantics for
    ksize > 7: sigma = 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    sigma = 0.3 * ((k - 1) * 0.5 - 1.0) + 0.8
    x = np.arange(k, dtype=np.float64) - (k - 1) / 2.0
    w = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return w / w.sum()


def _gaussian_mean(g: np.ndarray, k: int) -> np.ndarray:
    """k×k Gaussian-weighted local mean: separable 1-D convolutions
    (vectorized shifted adds per axis — O(k·H·W), no scipy) with
    edge-replicated borders.

    The kernel is symmetric, so mirrored taps pair up
    (w[t]·(x[t] + x[k-1-t])) — half the multiplies of the naive
    k-term loop (measured 2.8×; this is 40% of the whole per-doc
    lattice kernel). The regrouped summation differs from the naive
    order by ≤1e-13 on a 255-scale mean — verified zero threshold
    flips across every raster fixture, and the goldens pin it.

    Accumulation runs in float32 (r6): the input is 0-255 grayscale,
    so the weighted mean carries ~3e-5 absolute error vs float64 —
    against the integer-pixel > (mean - c) comparison with |c| = 2 a
    flip needs a boundary tie inside that margin, which flat regions
    (the only exact-tie producers) miss by the full |c|; verified zero
    flips on 1.9M-pixel noise AND exact goldens across every raster
    fixture incl. jitters. Halved memory traffic: 86.6 → 39.8 ms on a
    1224×1584 page (2.2×; _gaussian_mean was 38% of the fixture pass).
    (A sliding_window_view @ w matmul form was measured too: 54 ms —
    exact but slower than paired adds in f32.)"""
    w = _gaussian_kernel(k).astype(np.float32)
    pad = k // 2
    p = np.pad(g, pad, mode="edge")
    if p.dtype != np.float32:
        p = p.astype(np.float32)
    H = g.shape[0]
    Wd = g.shape[1]
    # even k has no center tap — start the accumulators at zero and
    # pair every tap (the kernel is exactly symmetric either way)
    rows = (w[pad] * p[pad:pad + H, :] if k % 2
            else np.zeros((H, p.shape[1]), dtype=np.float32))
    for t in range(pad):
        rows += w[t] * (p[t:t + H, :] + p[k - 1 - t:k - 1 - t + H, :])
    out = (w[pad] * rows[:, pad:pad + Wd] if k % 2
           else np.zeros((H, Wd), dtype=np.float32))
    for t in range(pad):
        out += w[t] * (rows[:, t:t + Wd] + rows[:, k - 1 - t:k - 1 - t + Wd])
    return out


def adaptive_threshold(
    img: np.ndarray, process_background: bool = False, blocksize: int = 15,
    c: int = -2, window: str = "gaussian"
) -> np.ndarray:
    """Grayscale (H, W) uint8 → binary ruling mask — `image_processing.py:9-53`.

    Foreground lines (dark on light) are inverted first unless
    ``process_background``; a pixel passes when it exceeds its local
    window mean minus ``c`` (cv2 THRESH_BINARY semantics). ``window``
    picks the local-mean weighting: "gaussian" (reference
    ADAPTIVE_THRESH_GAUSSIAN_C behavior, default) or "box".
    """
    # float32 end to end on the gaussian path: 0-255 pixels are exact
    # in f32 and _gaussian_mean accumulates in f32 anyway — one pad
    # copy instead of pad + astype (the box path re-casts to f64 for
    # its cumsum, where f32 would genuinely lose integer exactness)
    g = np.asarray(img, dtype=np.float32)
    if not process_background:
        g = np.float32(255.0) - g
    mean = _gaussian_mean(g, blocksize) if window == "gaussian" else _box_mean(g, blocksize)
    return g > (mean - float(c))


def _runs_along_rows(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All horizontal runs of True: (row, start, end) arrays, end exclusive.

    One nonzero scan over the diff, then sign-classified — the obvious
    two-pass form (nonzero(d==1), nonzero(d==-1)) scans the image twice
    and materializes two full-size boolean temps; this is the hottest
    primitive under the morphology/CC kernels (~200 calls per corpus
    pass). Row-major order interleaves each row's starts and ends, so
    classification preserves the identical per-run pairing."""
    H, W = mask.shape
    padded = np.zeros((H, W + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded, axis=1)
    # flatnonzero + divmod beats 2-D nonzero (one C pass over the
    # raveled diff, no per-axis index unravel) — measured ~17% on this
    # primitive, which runs ~200x per corpus pass
    flat = np.flatnonzero(d)
    vals = d.ravel()[flat]
    r, c = np.divmod(flat, d.shape[1])
    pos = vals == 1
    return r[pos], c[pos], c[~pos]


def _open_along_axis(mask: np.ndarray, size: int, axis: int) -> np.ndarray:
    """Binary morphological open with a 1×size (axis=1) or size×1 (axis=0)
    kernel: erase runs shorter than ``size``, keep longer runs at full
    extent — exactly cv2 erode+dilate with the same 1-D kernel."""
    m = mask if axis == 1 else mask.T
    rows, starts, ends = _runs_along_rows(m)
    keep = (ends - starts) >= max(size, 1)
    out = np.zeros_like(m, dtype=np.int8)
    if keep.any():
        # kept runs are disjoint maximal runs (next start >= end + 1),
        # so the running sum is only ever 0/1 (int8-exact) AND the
        # boundary indices never collide — plain fancy assignment is
        # equivalent to (and much faster than) the unbuffered
        # np.add.at scatter. (_dilate_along_axis must keep add.at:
        # its clamped extended boundaries can collide.)
        delta = np.zeros((m.shape[0], m.shape[1] + 1), dtype=np.int8)
        delta[rows[keep], starts[keep]] = 1
        delta[rows[keep], ends[keep]] = -1
        # numpy promotes integer cumsum to the platform int unless the
        # dtype is pinned; 0/1 values make int8 exact
        out = (delta.cumsum(axis=1, dtype=np.int8)[:, :-1] > 0).astype(np.int8)
    return out if axis == 1 else out.T


def _dilate_along_axis(mask: np.ndarray, amount: int, axis: int) -> np.ndarray:
    """Extend every run by ``amount`` pixels on both ends (1-D dilation)."""
    if amount <= 0:
        return mask
    m = (mask if axis == 1 else mask.T).astype(bool)
    rows, starts, ends = _runs_along_rows(m)
    W = m.shape[1]
    delta = np.zeros((m.shape[0], W + 1), dtype=np.int32)
    np.add.at(delta, (rows, np.maximum(starts - amount, 0)), 1)
    np.add.at(delta, (rows, np.minimum(ends + amount, W)), -1)
    out = (delta.cumsum(axis=1)[:, :-1] > 0).astype(np.int8)
    return out if axis == 1 else out.T


def connected_components(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """External bounding rects (x, y, w, h) of 8-connected components.

    Run-merge CC: runs within a row are nodes; runs in adjacent rows
    whose column spans touch (8-connectivity ⇒ ±1 overlap) are unioned.
    Cost is O(#runs α) — per-pixel work stays in the vectorized
    run-extraction above, so Python only loops over line blobs.
    """
    m = np.asarray(mask, dtype=bool)
    rows, starts, ends = _runs_along_rows(m)
    n = len(rows)
    if n == 0:
        return []

    # adjacent-row overlap pairs, fully vectorized (r6): the old form
    # looped every IMAGE row in Python (ruling masks are mostly empty
    # rows) with a per-pair two-pointer merge. Runs arrive row-major
    # and left-to-right, so within a row both starts and ends are
    # sorted: run b of row r touches run a of row r-1 (8-connectivity,
    # exclusive ends give the ±1 slack) iff
    # starts[a] <= ends[b]  →  a <  searchsorted(prev_starts, ends[b], right)
    # ends[a] >= starts[b]  →  a >= searchsorted(prev_ends, starts[b], left)
    urows, first = np.unique(rows, return_index=True)
    bounds = np.append(first, n)
    pa_parts: list[np.ndarray] = []
    pb_parts: list[np.ndarray] = []
    for i in range(1, len(urows)):
        if urows[i] != urows[i - 1] + 1:
            continue  # no vertically adjacent runs — nothing can touch
        p0, p1 = bounds[i - 1], bounds[i]
        c0, c1 = bounds[i], bounds[i + 1]
        hi = np.searchsorted(starts[p0:p1], ends[c0:c1], side="right")
        lo = np.searchsorted(ends[p0:p1], starts[c0:c1], side="left")
        cnt = hi - lo
        pos = cnt > 0
        if not pos.any():
            continue
        cc = cnt[pos]
        total = int(cc.sum())
        offs = np.repeat(np.cumsum(cc) - cc, cc)
        pa_parts.append(p0 + np.repeat(lo[pos], cc)
                        + (np.arange(total) - offs))
        pb_parts.append(np.repeat(np.arange(c0, c1)[pos], cc))

    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    if pa_parts:
        for a, b in zip(np.concatenate(pa_parts).tolist(),
                        np.concatenate(pb_parts).tolist()):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra

    roots = np.fromiter((find(i) for i in range(n)), dtype=np.int64,
                        count=n)
    # group-by root with numpy scatter mins/maxes; output order = each
    # component's FIRST run (row-major), matching the old dict order
    uroots, first_idx, inv = np.unique(
        roots, return_index=True, return_inverse=True)
    k = len(uroots)
    x0 = np.full(k, np.iinfo(np.int64).max)
    x1 = np.zeros(k, dtype=np.int64)
    y0 = np.full(k, np.iinfo(np.int64).max)
    y1 = np.zeros(k, dtype=np.int64)
    np.minimum.at(x0, inv, starts)
    np.maximum.at(x1, inv, ends)
    np.minimum.at(y0, inv, rows)
    np.maximum.at(y1, inv, rows + 1)
    order = np.argsort(first_idx, kind="stable")
    return [(int(x0[g]), int(y0[g]), int(x1[g] - x0[g]), int(y1[g] - y0[g]))
            for g in order]


def find_lines(
    threshold: np.ndarray,
    regions: list[tuple[int, int, int, int]] | None = None,
    direction: str = "horizontal",
    line_scale: int = 15,
    iterations: int = 0,
) -> tuple[np.ndarray, list[tuple[int, int, int, int]]]:
    """Ruling segments in one direction — `image_processing.py:56-135`.

    Morphological open with a 1×(W/scale) or (H/scale)×1 kernel keeps
    only long straight runs; each surviving blob's bounding rect
    collapses to its centerline segment (`:116-133` semantics,
    including the integer // 2 midpoint).
    Returns (direction mask, [(x1, y1, x2, y2)] in image coords).
    """
    mask = np.asarray(threshold, dtype=bool)
    if regions is not None:
        # zero out pixels outside user regions — `image_processing.py:105-110`
        keep = np.zeros_like(mask)
        for (x, y, w, h) in regions:
            keep[y:y + h, x:x + w] = True
        mask = mask & keep

    H, W = mask.shape
    if direction == "vertical":
        size, axis = H // line_scale, 0
    elif direction == "horizontal":
        size, axis = W // line_scale, 1
    else:
        raise ValueError("Specify direction as either 'vertical' or 'horizontal'")

    dmask = _open_along_axis(mask, size, axis)
    if iterations:
        dmask = _dilate_along_axis(dmask, iterations, axis)

    lines = []
    for (x, y, w, h) in connected_components(dmask):
        x1, x2, y1, y2 = x, x + w, y, y + h
        if direction == "vertical":
            lines.append(((x1 + x2) // 2, y2, (x1 + x2) // 2, y1))
        else:
            lines.append((x1, (y1 + y2) // 2, x2, (y1 + y2) // 2))
    return dmask.astype(np.int8), lines


def find_contours(vertical: np.ndarray, horizontal: np.ndarray) -> list[tuple[int, int, int, int]]:
    """Table-boundary rects from the OR of the two masks, 10 largest by
    area — `image_processing.py:138-175` (`mask = v + h`, `:156`; cap `:168`)."""
    mask = np.asarray(vertical, bool) | np.asarray(horizontal, bool)
    rects = connected_components(mask)
    rects.sort(key=lambda r: r[2] * r[3], reverse=True)
    return rects[:10]


def find_joints(
    contours: list[tuple[int, int, int, int]],
    vertical: np.ndarray,
    horizontal: np.ndarray,
) -> dict[tuple[int, int, int, int], list[tuple[int, int]]]:
    """Joint coords per table rect from the AND of the masks —
    `image_processing.py:178-224` (`np.multiply` `:201`; ≤4-joint drop
    `:215`; blob-center joint coords and (x, y+h, x+w, y) table keys)."""
    joints_mask = np.asarray(vertical, bool) & np.asarray(horizontal, bool)
    tables: dict[tuple[int, int, int, int], list[tuple[int, int]]] = {}
    for (x, y, w, h) in contours:
        roi = joints_mask[y:y + h, x:x + w]
        blobs = connected_components(roi)
        if len(blobs) <= 4:
            continue
        joint_coords = []
        for (jx, jy, jw, jh) in blobs:
            c1 = x + (2 * jx + jw) // 2
            c2 = y + (2 * jy + jh) // 2
            joint_coords.append((c1, c2))
        tables[(x, y + h, x + w, y)] = joint_coords
    return tables


def scale_image_to_pdf(
    tables: dict[tuple[int, int, int, int], list[tuple[int, int]]],
    v_segments: list[tuple[int, int, int, int]],
    h_segments: list[tuple[int, int, int, int]],
    pdf_w: float,
    pdf_h: float,
    img_w: int,
    img_h: int,
):
    """Image space (top-left origin) → PDF space (bottom-left origin) —
    `camelot/utils.py:228-283` (`scale_image`) with the scalers from
    `camelot/parsers/lattice.py:244-251`."""
    fx = pdf_w / float(img_w)
    fy = pdf_h / float(img_h)

    def px(v):  # x: scale only
        return float(v) * fx

    def py(v):  # y: flip about image height, then scale
        return abs(float(v) - img_h) * fy

    tables_new = {}
    for (x1, y1, x2, y2), joints in tables.items():
        k = (px(x1), py(y1), px(x2), py(y2))
        tables_new[k] = [(px(jx), py(jy)) for jx, jy in joints]

    v_new = np.asarray(
        [(px(x1), py(y1), px(x2), py(y2)) for x1, y1, x2, y2 in v_segments],
        dtype=np.float64,
    ).reshape(-1, 4)
    h_new = np.asarray(
        [(px(x1), py(y1), px(x2), py(y2)) for x1, y1, x2, y2 in h_segments],
        dtype=np.float64,
    ).reshape(-1, 4)
    return tables_new, v_new, h_new


# ---------------------------------------------------------------------------
# bitmap payload codec (fixture ↔ kernel) — stand-in for the ghostscript
# render (`camelot/parsers/lattice.py:211-221`): `media_ref` resolves to
# a pre-rasterized page bitmap shipped inline as packed bits.
# ---------------------------------------------------------------------------

def encode_bitmap(black_mask: np.ndarray) -> dict:
    """(H, W) bool black-pixel mask → JSON-safe payload dict."""
    import base64

    m = np.asarray(black_mask, dtype=bool)
    return {
        "w": int(m.shape[1]),
        "h": int(m.shape[0]),
        "bits": base64.b64encode(np.packbits(m, axis=None).tobytes()).decode("ascii"),
    }


def decode_bitmap(payload: dict) -> np.ndarray:
    """Payload dict → (H, W) uint8 grayscale. Default black lines on a
    white page; ``fg``/``bg`` override the two levels (e.g. bright
    background rulings for the process_background path).

    ``noise_amp``/``noise_seed`` add deterministic paper-grain noise:
    background pixels shift up to ``noise_amp`` levels toward the
    foreground (seeded generator — byte-stable across runs). A small
    clean halo is kept around strokes so grain models paper texture,
    not ink bleed — grain adjacent to a ruling would otherwise extend
    its pixel run and perturb detected segment endpoints. This is the
    noisy-scan stand-in that exercises the Gaussian threshold window on
    non-two-level input."""
    import base64

    w, h = int(payload["w"]), int(payload["h"])
    fg = int(payload.get("fg", 0))
    bg = int(payload.get("bg", 255))
    bits = np.frombuffer(base64.b64decode(payload["bits"]), dtype=np.uint8)
    mask = np.unpackbits(bits, count=w * h).reshape(h, w).astype(bool)
    img = np.full((h, w), bg, dtype=np.uint8)
    img[mask] = fg
    amp = int(payload.get("noise_amp", 0))
    if amp:
        rng = np.random.default_rng(int(payload.get("noise_seed", 0)))
        noise = rng.integers(0, amp + 1, size=(h, w)).astype(np.int16)
        pad = 3
        pm = np.pad(mask, pad)
        halo = np.zeros_like(mask)
        for dr in range(-pad, pad + 1):
            for dc in range(-pad, pad + 1):
                halo |= pm[pad + dr:pad + dr + h, pad + dc:pad + dc + w]
        sign = 1 if fg > bg else -1
        out = img.astype(np.int16)
        out[~halo] += sign * noise[~halo]
        img = np.clip(out, 0, 255).astype(np.uint8)
    return img
