"""TGA decoder tests: round-trips against the from-scratch writer below
(all 6 image types, 15/16/24/32-bit, palette offsets, origins, RLE
crossing rows), plus dispatch-heuristic checks (TGA has no magic)."""

import numpy as np
import pytest

from french_admin_etl_spark.operators.multimodal import decode_image
from french_admin_etl_spark.operators.tga import decode_tga, looks_like_tga


def _pack_px(rgb_row, depth):
    """(n,3) ints → packed bytes in TGA order (BGR / A1R5G5B5)."""
    out = bytearray()
    for r, g, b in rgb_row:
        if depth in (15, 16):
            v = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
            if depth == 16:
                v |= 0x8000  # attr bit set; decoder must ignore it
            out += int(v).to_bytes(2, "little")
        elif depth == 24:
            out += bytes([b, g, r])
        else:
            out += bytes([b, g, r, 0xFF])
    return bytes(out)


def _rle_pack(pix: bytes, bpp: int) -> bytes:
    """Greedy TGA RLE over the whole image (packets cross rows)."""
    px = [pix[i : i + bpp] for i in range(0, len(pix), bpp)]
    out = bytearray()
    i = 0
    while i < len(px):
        run = 1
        while i + run < len(px) and px[i + run] == px[i] and run < 128:
            run += 1
        if run >= 2:
            out += bytes([0x80 | (run - 1)]) + px[i]
            i += run
            continue
        j = i + 1
        while j < len(px) and j - i < 128 and not (
            j + 1 < len(px) and px[j + 1] == px[j]
        ):
            j += 1
        out += bytes([j - i - 1]) + b"".join(px[i:j])
        i = j
    return bytes(out)


def _tga_write(
    img,  # (h,w,3) RGB ints for color; (h,w) for gray/palette index
    img_type: int,
    depth: int = 24,
    top_down: bool = True,
    right_left: bool = False,
    palette=None,  # (n,3) RGB for type 1/9
    cmap_bits: int = 24,
    cmap_first: int = 0,
    id_field: bytes = b"",
    footer: bool = False,
) -> bytes:
    h, w = img.shape[:2]
    # the FILE stores rows bottom-to-top unless the top-down bit is set,
    # and left-to-right unless the mirror bit is set — reorder so the
    # decoder's un-flip recovers `img` exactly
    if not top_down:
        img = img[::-1]
    if right_left:
        img = img[:, ::-1]
    desc = (0x20 if top_down else 0) | (0x10 if right_left else 0)
    cmap_type = 1 if palette is not None else 0
    cmap_len = len(palette) if palette is not None else 0
    hdr = bytes([len(id_field), cmap_type, img_type])
    hdr += cmap_first.to_bytes(2, "little") + cmap_len.to_bytes(2, "little")
    hdr += bytes([cmap_bits if palette is not None else 0])
    hdr += b"\x00\x00\x00\x00"  # origins
    hdr += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    hdr += bytes([depth, desc])
    out = bytearray(hdr + id_field)
    if palette is not None:
        out += _pack_px(palette, cmap_bits)
    base = img_type & ~8
    if base == 3:
        pix = bytes(img.reshape(-1).astype(np.uint8))
        bpp = 1
    elif base == 1:
        pix = bytes((img.reshape(-1) + cmap_first).astype(np.uint8))
        bpp = 1
    else:
        pix = b"".join(_pack_px(img.reshape(-1, 3), depth) for _ in (0,))
        bpp = (depth + 7) // 8
    out += _rle_pack(pix, bpp) if img_type & 8 else pix
    if footer:
        out += b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
    return bytes(out)


def _gray601(rgb):
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def _expand5(rgb):
    """What 5-bit quantization + high-bit replication does to [0,255]."""
    q = (np.asarray(rgb, np.int64) >> 3)
    return (q << 3) | (q >> 2)


def test_tga_truecolor_roundtrip_all_depths_and_origins():
    rng = np.random.default_rng(31)
    for depth, rle, top_down, rl in [
        (24, False, True, False),
        (24, True, False, False),     # bottom-up + RLE
        (32, True, True, True),       # alpha ignored + mirrored
        (16, False, True, False),     # A1R5G5B5
        (15, True, False, True),
    ]:
        h, w = 11, 14
        img = rng.integers(0, 256, (h, w, 3), dtype=np.int64)
        img[3] = img[3, 0]  # a constant row so RLE builds real runs
        t = 10 if rle else 2
        payload = _tga_write(img, t, depth, top_down, rl, footer=rle)
        dw, dh, gray = decode_image(payload)
        assert (dw, dh) == (w, h)
        want_rgb = _expand5(img) if depth in (15, 16) else img
        want = _gray601(want_rgb.astype(np.float64))
        assert np.allclose(gray, want), (depth, rle, top_down, rl)


def test_tga_gray_and_palette():
    rng = np.random.default_rng(32)
    h, w = 9, 13
    g = rng.integers(0, 256, (h, w), dtype=np.int64)
    for t in (3, 11):
        payload = _tga_write(g, t, depth=8)
        dw, dh, gray = decode_image(payload)
        assert (dw, dh) == (w, h)
        assert np.allclose(gray, g)
    # palette, with a nonzero first-entry offset and 16-bit entries
    pal = rng.integers(0, 256, (32, 3), dtype=np.int64)
    idx = rng.integers(0, 32, (h, w), dtype=np.int64)
    for t, bits in ((1, 24), (9, 32), (1, 16)):
        payload = _tga_write(
            idx, t, depth=8, palette=pal, cmap_bits=bits, cmap_first=64,
            id_field=b"test-id",
        )
        dw, dh, gray = decode_image(payload)
        want_pal = _expand5(pal) if bits in (15, 16) else pal
        assert np.allclose(gray, _gray601(want_pal[idx].astype(np.float64))), (t, bits)


def test_tga_heuristic_and_errors():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.int64)
    good = _tga_write(img, 2, 24)
    assert looks_like_tga(good)
    # junk does not pass the heuristic: decode_image raises the generic
    # NotImplementedError, not a TGA error
    with pytest.raises(NotImplementedError, match="codec not decodable"):
        decode_image(b"\x00\x00\x07" + b"\x00" * 64)  # bad image type 7
    with pytest.raises(NotImplementedError, match="codec not decodable"):
        decode_image(bytes(18))  # image type 0 = no data
    # inconsistent: true-color claiming a color map
    bad = bytearray(good)
    bad[1] = 1
    with pytest.raises(NotImplementedError, match="codec not decodable"):
        decode_image(bytes(bad))
    # truncations fail loudly once past the heuristic
    with pytest.raises(ValueError, match="truncated TGA"):
        decode_tga(good[:30])
    rle = _tga_write(img, 10, 24)
    with pytest.raises(ValueError, match="truncated TGA RLE"):
        decode_tga(rle[:-10])
    # palette index out of range
    pal = rng.integers(0, 256, (4, 3), dtype=np.int64)
    payload = _tga_write(
        np.full((3, 3), 2, np.int64), 1, depth=8, palette=pal, cmap_first=0
    )
    bad_idx = bytearray(payload)
    bad_idx[-1] = 250  # beyond cmap_len=4
    with pytest.raises(ValueError, match="palette index"):
        decode_tga(bytes(bad_idx))


def test_tga_footer_never_bypasses_validation():
    """Session-6 review finding: a crafted v2 footer on a junk header
    must not reach the pixel paths with an unvalidated depth (7.68 GB
    allocation budget) — the footer affects DISPATCH only; decode_tga
    validates regardless and rejects with the honest ValueError."""
    hdr = bytearray(18)
    hdr[2] = 10          # RLE true-color
    hdr[12:14] = (60000).to_bytes(2, "little")
    hdr[14:16] = (4000).to_bytes(2, "little")
    hdr[16] = 255        # absurd depth — must be rejected, not sized
    junk = bytes(hdr) + b"\x00" * 64 + b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
    assert looks_like_tga(junk)  # footer routes it to the TGA decoder...
    with pytest.raises(ValueError, match="plausible TGA"):
        decode_tga(junk)  # ...which rejects it loudly
    # footer + cmap-less color-mapped type: same taxonomy, no TypeError
    hdr2 = bytearray(18)
    hdr2[2] = 1
    hdr2[12:14] = hdr2[14:16] = (4).to_bytes(2, "little")
    hdr2[16] = 8
    junk2 = bytes(hdr2) + b"\x00" * 16 + b"\x00" * 8 + b"TRUEVISION-XFILE.\x00"
    with pytest.raises(ValueError, match="plausible TGA"):
        decode_tga(junk2)
    # interleaved descriptors (bits 6-7) are rejected, not scrambled
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (4, 5, 3), dtype=np.int64)
    good = bytearray(_tga_write(img, 2, 24))
    good[17] |= 0x40
    assert not looks_like_tga(bytes(good))
    with pytest.raises(ValueError, match="plausible TGA"):
        decode_tga(bytes(good))


# ------------------------------------------------------------------- ICO
# (kept in this file: the other magicless/container dispatch additions of
# round-5 session 6 live here too)


def _dib(img_rgb, bpp, palette=None):
    """Headerless BMP DIB as ICO embeds it: BITMAPINFOHEADER with the
    DOUBLED height, optional BGRA palette, bottom-up XOR rows, then a
    1-bit AND mask (all zeros) padded to 4-byte rows."""
    h, w = img_rgb.shape[:2]
    info = bytearray(40)
    info[0:4] = (40).to_bytes(4, "little")
    info[4:8] = w.to_bytes(4, "little")
    info[8:12] = (h * 2).to_bytes(4, "little", signed=True)  # XOR + AND
    info[12:14] = (1).to_bytes(2, "little")
    info[14:16] = bpp.to_bytes(2, "little")
    out = bytearray(info)
    if palette is not None:
        for r, g, b in palette:
            out += bytes([b, g, r, 0])
    if bpp == 8:
        stride = (w + 3) & ~3
        for y in range(h - 1, -1, -1):  # bottom-up
            row = bytes(int(v) for v in img_rgb[y])  # img holds indices
            out += row + b"\x00" * (stride - w)
    else:  # 32-bpp BGRA
        for y in range(h - 1, -1, -1):
            for x in range(w):
                r, g, b = img_rgb[y, x]
                out += bytes([b, g, r, 0xFF])
    and_stride = ((w + 31) // 32) * 4
    out += b"\x00" * (and_stride * h)
    return bytes(out)


def _ico(entries):
    """entries: list of (w, h, blob)."""
    out = bytearray(b"\x00\x00\x01\x00" + len(entries).to_bytes(2, "little"))
    off = 6 + 16 * len(entries)
    dir_part = bytearray()
    blobs = bytearray()
    for w, h, blob in entries:
        dir_part += bytes([w % 256, h % 256, 0, 0]) + (1).to_bytes(2, "little")
        dir_part += (32).to_bytes(2, "little")
        dir_part += len(blob).to_bytes(4, "little") + off.to_bytes(4, "little")
        blobs += blob
        off += len(blob)
    return bytes(out + dir_part + blobs)


def test_ico_largest_entry_dib_and_png():
    rng = np.random.default_rng(51)
    small_idx = rng.integers(0, 8, (16, 16), dtype=np.int64)
    pal = rng.integers(0, 256, (256, 3), dtype=np.int64)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.int64)
    ico = _ico([
        (16, 16, _dib(small_idx, 8, palette=pal)),
        (32, 32, _dib(big, 32)),
    ])
    dw, dh, gray = decode_image(ico)
    assert (dw, dh) == (32, 32)  # largest entry wins
    want = _gray601(big.astype(np.float64))
    assert np.allclose(gray, want)

    # single palette entry decodes through the BMP palette path
    ico8 = _ico([(16, 16, _dib(small_idx, 8, palette=pal))])
    dw, dh, gray = decode_image(ico8)
    assert (dw, dh) == (16, 16)
    assert np.allclose(gray, _gray601(pal[small_idx].astype(np.float64)))

    # PNG entry routes through the PNG decoder (minimal gray-8 encoder)
    import struct
    import zlib

    def _png_chunk(typ, data):
        c = typ + data
        return struct.pack(">I", len(data)) + c + struct.pack(
            ">I", zlib.crc32(c)
        )

    g8 = rng.integers(0, 256, (20, 24), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 24, 20, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in g8)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    icop = _ico([(24, 20, png)])
    dw, dh, gray = decode_image(icop)
    assert (dw, dh) == (24, 20)
    assert np.allclose(gray, g8.astype(np.float64))

    # errors: truncated directory / OOB entry
    one = _ico([(4, 4, _dib(big[:4, :4], 32))])
    two_claimed = bytearray(one)
    two_claimed[4:6] = (2).to_bytes(2, "little")  # claims a 2nd entry
    with pytest.raises(ValueError, match="truncated ICO|out of bounds"):
        decode_image(bytes(two_claimed))
    oob = bytearray(_ico([(4, 4, _dib(big[:4, :4], 32))]))
    oob[6 + 12 : 6 + 16] = (9999).to_bytes(4, "little")
    with pytest.raises(ValueError, match="out of bounds"):
        decode_image(bytes(oob))


def test_bmp_32bpp_plain_file():
    """The 32-bpp BMP support added for ICO also serves plain BMPs."""
    rng = np.random.default_rng(52)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.int64)
    h, w = img.shape[:2]
    px = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = img[y, x]
            px += bytes([b, g, r, 0x80])
    bmp = (
        b"BM" + (54 + len(px)).to_bytes(4, "little") + bytes(4)
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (32).to_bytes(2, "little")
        + bytes(24) + bytes(px)
    )
    dw, dh, gray = decode_image(bmp)
    assert (dw, dh) == (w, h)
    assert np.allclose(gray, _gray601(img.astype(np.float64)))
