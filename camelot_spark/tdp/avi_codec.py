"""Pure-stdlib AVI (RIFF) MJPEG demuxer/muxer — the real VIDEO
container behind ``multimodal.frame_sample``, built on the codec set
this repo already carries: an AVI file is a RIFF tree (the same chunk
grammar as WAV) whose ``movi`` list holds one JPEG per ``00dc`` video
chunk, and the JPEG codec here decodes every Huffman layout — so
Motion-JPEG videos decode end to end with zero dependencies.

Demuxer: RIFF walk (``LIST``/plain chunks, word alignment), ``avih``
main header (dims, total frames), ``00dc``/``00db`` frame chunks in
stream order; each frame decodes through ``jpeg_codec`` (grayscale
luma, matching the GIF path's contract). ``idx1`` and audio streams
are skipped. Muxer (the in-test generator): minimal single-video-
stream AVI — avih + strl(strh/strf) headers and a movi list of
baseline-JPEG frames.

Scale note: like every codec here, decode runs inside Arrow-batched
``mapInPandas`` workers; per-video cost stays executor-local and each
frame is an independent JPEG decode.
"""

from __future__ import annotations

import struct

import numpy as np

AVI_MAGIC = b"RIFF"


def _chunks(data: bytes, pos: int, end: int):
    """Iterate (fourcc, body_start, body_size) through a RIFF region,
    honoring word alignment."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def decode_avi(payload: bytes) -> list[np.ndarray]:
    """AVI bytes → list of (H, W) uint8 grayscale frames (each ``00dc``
    MJPEG chunk decoded via ``jpeg_codec``; luma for color frames)."""
    from .jpeg_codec import JPEG_MAGIC, decode_jpeg

    if payload[:4] != AVI_MAGIC or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int):
        for fourcc, body, size in _chunks(payload, pos, end):
            if fourcc == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif fourcc[2:4] in (b"dc", b"db"):
                blob = payload[body:body + size]
                if blob[:3] != JPEG_MAGIC[:3]:
                    raise NotImplementedError(
                        "non-MJPEG AVI video stream needs an external decoder")
                img = decode_jpeg(blob)
                if img.ndim == 3:  # color frame → integer ITU-R 601 luma
                    r = img[:, :, 0].astype(np.int64)
                    g = img[:, :, 1].astype(np.int64)
                    b = img[:, :, 2].astype(np.int64)
                    img = ((299 * r + 587 * g + 114 * b + 500) // 1000
                           ).astype(np.uint8)
                frames.append(img)
            # avih/strh/strf/idx1/audio chunks: skipped

    walk(12, len(payload))
    if not frames:
        raise ValueError("AVI with no video frames")
    return frames


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi(frames: list[np.ndarray], fps: int = 10,
               quality: int = 90) -> bytes:
    """Minimal single-stream MJPEG AVI from equal-shaped (H, W)
    grayscale (or (H, W, 3) RGB) uint8 frames."""
    from .jpeg_codec import encode_jpeg

    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(np.asarray(f, dtype=np.uint8), quality=quality)
             for f in frames]
    max_bytes = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I", 1_000_000 // fps, max_bytes * fps, 0, 0x10,  # hasIndex-less
        len(frames), 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), max_bytes,
        0xFFFFFFFF, 0) + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_metadata(payload: bytes) -> dict:
    """Header-only peek: (width, height, n_frames, fps) from the avih
    main header — no frame decode, the O(header-bytes) metadata scan a
    large pipeline runs before deciding what to decode."""
    if payload[:4] != AVI_MAGIC or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    def find_avih(pos: int, end: int):
        for fourcc, body, size in _chunks(payload, pos, end):
            if fourcc == b"LIST":
                got = find_avih(body + 4, body + size)
                if got is not None:
                    return got
            elif fourcc == b"avih":
                return payload[body:body + size]
        return None

    avih = find_avih(12, len(payload))
    if avih is None or len(avih) < 40:
        raise ValueError("AVI without an avih header")
    vals = struct.unpack("<10I", avih[:40])
    usec_per_frame, _, _, _, n_frames, _, _, _, width, height = vals
    fps = 1_000_000 // usec_per_frame if usec_per_frame else 0
    return {"width": width, "height": height, "n_frames": n_frames,
            "fps": fps}
