"""From-scratch Truevision TGA decode (stdlib + numpy only).

TGA is the no-library-needed texture/scan format that still shows up in
crawled game-asset and design corpora. Covered: true-color 16/24/32-bit,
grayscale 8-bit, color-mapped 8-bit (15/16/24/32-bit palette entries),
both uncompressed and RLE variants (types 1/2/3/9/10/11), bottom-up or
top-down origin, right-to-left mirroring, RLE packets crossing row
boundaries (the spec forbids it, real writers do it anyway).

TGA has NO magic number, so ``decode_image`` dispatches to it LAST and
only after a plausibility check on the 18-byte header (`looks_like_tga`)
— the TGA v2 footer ("TRUEVISION-XFILE.") is used as a strong signal
when present but not required (v1 files predate it). A false positive
costs one dead-lettered row under the engine's S9 contract, exactly
like any other undecodable payload.

Reference parity note: like ``operators/tiff.py`` this belongs to the
training-data extension surface (multimodal feature extraction over
opaque binary columns), reached via Arrow ``mapInPandas`` — the
reference engine has no media path.
"""

from __future__ import annotations

__all__ = ["decode_tga", "looks_like_tga"]

_VALID_TYPES = {1, 2, 3, 9, 10, 11}


def _header(payload: bytes):
    if len(payload) < 18:
        raise ValueError("TGA header truncated")
    return {
        "id_len": payload[0],
        "cmap_type": payload[1],
        "img_type": payload[2],
        "cmap_first": int.from_bytes(payload[3:5], "little"),
        "cmap_len": int.from_bytes(payload[5:7], "little"),
        "cmap_bits": payload[7],
        "w": int.from_bytes(payload[12:14], "little"),
        "h": int.from_bytes(payload[14:16], "little"),
        "depth": payload[16],
        "desc": payload[17],
    }


def _header_consistent(hd: dict) -> bool:
    """The full self-consistency check — EVERY decode path requires it
    (round-5 session-6 review finding: the v2 footer must not bypass
    validation, or a crafted footer+junk-header file reaches the pixel
    paths with an unvalidated depth and an unbounded allocation budget)."""
    t = hd["img_type"]
    if t not in _VALID_TYPES or hd["cmap_type"] > 1:
        return False
    if hd["w"] == 0 or hd["h"] == 0:
        return False
    if hd["desc"] & 0xC0:
        # legacy two-/four-way interleave: decoding it sequentially would
        # produce a silently scrambled plane — reject → S9 dead-letter
        return False
    base = t & ~8
    if base == 1:  # color-mapped: 8-bit indices into a present palette
        return (
            hd["cmap_type"] == 1
            and hd["depth"] == 8
            and hd["cmap_bits"] in (15, 16, 24, 32)
            and hd["cmap_len"] > 0
        )
    if base == 2:
        return hd["depth"] in (15, 16, 24, 32) and hd["cmap_type"] == 0
    return hd["depth"] == 8 and hd["cmap_type"] == 0  # grayscale


def looks_like_tga(payload: bytes) -> bool:
    """Heuristic magic for a magicless format: a self-consistent header,
    OR the v2 footer signature. The footer only affects DISPATCH — it
    routes a claimed-TGA file with a broken header to ``decode_tga``,
    which then rejects it with the honest ValueError taxonomy instead of
    the generic not-a-known-codec error; it never bypasses validation."""
    try:
        hd = _header(payload)
    except ValueError:
        return False
    if _header_consistent(hd):
        return True
    return len(payload) >= 44 and payload[-18:] == b"TRUEVISION-XFILE.\x00"


def _rle_expand(data: bytes, n_px: int, bpp: int) -> bytes:
    """RLE packets: header bit7 = run (count×one pixel), else raw
    (count literal pixels); count = low7 + 1. Packets may cross rows."""
    out = bytearray()
    need = n_px * bpp
    i = 0
    while len(out) < need:
        if i >= len(data):
            raise ValueError("truncated TGA RLE stream")
        hdr = data[i]
        i += 1
        count = (hdr & 0x7F) + 1
        if hdr & 0x80:
            px = data[i : i + bpp]
            if len(px) < bpp:
                raise ValueError("truncated TGA RLE run pixel")
            out += px * count
            i += bpp
        else:
            lit = data[i : i + count * bpp]
            if len(lit) < count * bpp:
                raise ValueError("truncated TGA RLE raw packet")
            out += lit
            i += count * bpp
    return bytes(out[:need])


def _to_rgb(flat, depth: int, np):
    """(n, bytes_per_px) uint8 → (n, 3) float64 RGB in [0, 255]."""
    if depth in (15, 16):
        v = flat[:, 0].astype(np.int64) | (flat[:, 1].astype(np.int64) << 8)
        r = (v >> 10) & 0x1F
        g = (v >> 5) & 0x1F
        b = v & 0x1F
        # 5-bit → 8-bit: replicate high bits (the standard expansion)
        exp = lambda c: ((c << 3) | (c >> 2)).astype(np.float64)  # noqa: E731
        return np.stack([exp(r), exp(g), exp(b)], axis=1)
    # 24/32-bit: BGR(A) order
    return flat[:, [2, 1, 0]].astype(np.float64)


def decode_tga(payload: bytes):
    """Decode TGA → ``(width, height, gray)``, gray float64 HxW in
    [0, 255] — the ``decode_image`` contract."""
    import numpy as np

    hd = _header(payload)
    if not _header_consistent(hd):
        raise ValueError("not a plausible TGA header")
    w, h, depth = hd["w"], hd["h"], hd["depth"]
    if w * h > 1 << 28:
        raise ValueError(f"TGA dimensions {w}x{h} exceed the decoder cap")
    base = hd["img_type"] & ~8
    rle = bool(hd["img_type"] & 8)
    bpp = (depth + 7) // 8
    pos = 18 + hd["id_len"]

    cmap = None
    if hd["cmap_type"] == 1:
        entry_bytes = (hd["cmap_bits"] + 7) // 8
        cm_size = hd["cmap_len"] * entry_bytes
        raw_cm = payload[pos : pos + cm_size]
        if len(raw_cm) < cm_size:
            raise ValueError("truncated TGA color map")
        pos += cm_size
        entries = np.frombuffer(raw_cm, np.uint8).reshape(
            hd["cmap_len"], entry_bytes
        )
        cmap = _to_rgb(entries, hd["cmap_bits"], np)  # (len, 3)

    n_px = w * h
    if rle:
        pix = _rle_expand(payload[pos:], n_px, bpp)
    else:
        pix = payload[pos : pos + n_px * bpp]
        if len(pix) < n_px * bpp:
            raise ValueError("truncated TGA pixel data")
    flat = np.frombuffer(pix, np.uint8).reshape(n_px, bpp)

    if base == 3:  # grayscale
        gray = flat[:, 0].astype(np.float64).reshape(h, w)
    elif base == 2:  # true color
        rgb = _to_rgb(flat, depth, np).reshape(h, w, 3)
        gray = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    else:  # color-mapped
        idx = flat[:, 0].astype(np.int64) - hd["cmap_first"]
        if int(idx.min()) < 0 or int(idx.max()) >= hd["cmap_len"]:
            raise ValueError("TGA palette index out of range")
        rgb = cmap[idx].reshape(h, w, 3)
        gray = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]

    if not hd["desc"] & 0x20:  # bit 5 clear = bottom-up origin (default)
        gray = gray[::-1]
    if hd["desc"] & 0x10:  # bit 4 = right-to-left
        gray = gray[:, ::-1]
    return w, h, gray
