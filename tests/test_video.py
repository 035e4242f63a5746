"""Real video frame iteration (Y4M + uncompressed AVI), containers built
by hand in the test so the formats themselves are pinned."""

import hashlib

import numpy as np
import pytest

from french_admin_etl_spark.operators.video import decode_video_frames


def _y4m(frames_y, w, h, chroma="420"):
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode()
    csize = {"420": (w // 2) * (h // 2) * 2, "444": w * h * 2, "mono": 0}[chroma]
    out = bytearray(head)
    for y in frames_y:
        out += b"FRAME\n" + bytes(y.astype(np.uint8).tobytes()) + bytes(csize)
    return bytes(out)


def _chunk(fourcc, data):
    pad = b"\x00" if len(data) & 1 else b""
    return fourcc + len(data).to_bytes(4, "little") + data + pad


def _list(kind, body):
    return _chunk(b"LIST", kind + body)


def _avi(frames_bgr, w, h, compression=0, bpp=24):
    """Minimal RIFF AVI: hdrl(avih + strl(strh+strf BITMAPINFOHEADER)) +
    movi(00db raw bottom-up padded BGR frames)."""
    stride = (w * 3 + 3) & ~3
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)  # positive = bottom-up
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + compression.to_bytes(4, "little")
        + bytes(20)
    )
    strh = b"vids" + bytes(52)
    avih = bytes(56)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    for bgr in frames_bgr:
        rows = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up
            row = bytes(bgr[y].astype(np.uint8).tobytes())
            rows += row + bytes(stride - w * 3)
        movi_body += _chunk(b"00db", bytes(rows))
    movi = _list(b"movi", movi_body)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _frames(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w)).astype(np.float64) for _ in range(n)]


def test_y4m_luma_planes_exact():
    ys = _frames(4, 6, 8)
    for chroma in ("420", "444", "mono"):
        got = list(decode_video_frames(_y4m(ys, 8, 6, chroma)))
        assert [g[0] for g in got] == [0, 1, 2, 3]
        for (_i, w, h, gray), src in zip(got, ys):
            assert (w, h) == (8, 6)
            assert np.array_equal(gray, src), chroma


def test_y4m_malformed_and_unsupported():
    ys = _frames(2, 4, 4)
    with pytest.raises(NotImplementedError):
        list(decode_video_frames(_y4m(ys, 4, 4).replace(b"C420", b"C410")))
    with pytest.raises(ValueError):
        list(decode_video_frames(_y4m(ys, 4, 4)[:-10]))  # truncated frame


def test_avi_bgr_frames_bt601_and_row_padding():
    h, w = 4, 5  # stride 16 != 15: padding exercised
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, (h, w, 3)).astype(np.float64) for _ in range(3)]
    got = list(decode_video_frames(_avi(frames, w, h)))
    assert len(got) == 3
    for (_i, gw, gh, gray), bgr in zip(got, frames):
        assert (gw, gh) == (w, h)
        want = 0.299 * bgr[:, :, 2] + 0.587 * bgr[:, :, 1] + 0.114 * bgr[:, :, 0]
        assert np.allclose(gray, want)


def test_avi_compressed_is_the_ffmpeg_seam():
    frames = [np.zeros((4, 4, 3))]
    with pytest.raises(NotImplementedError):
        list(decode_video_frames(_avi(frames, 4, 4, compression=0x44495658)))  # XVID
    with pytest.raises(NotImplementedError):
        list(decode_video_frames(b"\x00\x00\x00\x00unknown container"))


def test_sample_video_frames_real_decode_e2e(spark):
    """mapInPandas plumbing over real containers: every-Nth sampling,
    cross-container frame digests, and per-row err isolation."""
    from french_admin_etl_spark.operators.multimodal import sample_video_frames

    ys = _frames(7, 8, 8, seed=9)
    clip = _y4m(ys, 8, 8)
    rows = [
        (1, "video", bytearray(clip)),
        (2, "video", bytearray(b"RIFF\x08\x00\x00\x00AVI ")),  # no strf/movi
        (3, "image", bytearray(b"ignored")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = sample_video_frames(df, every_nth=3, decode_stub=False).collect()
    ok = sorted(
        (r["frame_idx"], r["frame_sha"]) for r in out if r["media_id"] == 1
    )
    want = [
        (i, hashlib.sha256(ys[i].astype(np.uint8).tobytes()).hexdigest())
        for i in (0, 3, 6)
    ]
    assert ok == want
    bad = [r for r in out if r["media_id"] == 2]
    assert len(bad) == 1 and bad[0]["err"] is not None
    assert not [r for r in out if r["media_id"] == 3]  # kind filter


def _avi_mjpeg(jpegs, w, h):
    """MJPEG AVI: same RIFF skeleton as _avi but biCompression='MJPG' and
    each 00dc chunk is one standalone JPEG."""
    strf = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"MJPG"
        + bytes(20)
    )
    strh = b"vids" + bytes(52)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", bytes(56))
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_avi_mjpeg_frames_decode_via_jpeg():
    """MJPEG: every movi chunk is a standalone JPEG decoded by the
    in-house T.81 decoder — near-lossless at q=1, per-frame dims from the
    frame itself; a corrupt frame raises (caller dead-letters the row)."""
    from test_jpeg import encode_jpeg

    h, w = 16, 24
    ys = _frames(3, h, w, seed=11)
    q1 = np.ones((8, 8))
    jpegs = [encode_jpeg([y], w, h, [(1, 1)], [0], {0: q1}) for y in ys]
    got = list(decode_video_frames(_avi_mjpeg(jpegs, w, h)))
    assert [g[0] for g in got] == [0, 1, 2]
    for (_i, gw, gh, gray), src in zip(got, ys):
        assert (gw, gh) == (w, h)
        assert float(np.max(np.abs(gray - src))) <= 2.0
    # corrupt middle frame: iteration reaches it then raises (S9 isolates
    # per ROW upstream — one bad clip kills only that clip's row)
    bad = list(jpegs)
    bad[1] = b"\xff\xd8garbage"
    it = decode_video_frames(_avi_mjpeg(bad, w, h))
    assert next(it)[0] == 0
    with pytest.raises(ValueError):
        list(it)


def _gif_lzw_blocks(pixels: bytes, mcs: int) -> bytes:
    """LZW-compress pixels into GIF sub-blocks (same emit loop the GIF
    round-trip test pins: width bumps at the giflib convention)."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    bits = bytearray()
    acc = nbits = 0

    def emit(code):
        nonlocal acc, nbits, width
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if next_code >= (1 << width) and width < 12:
            width += 1

    emit(clear)
    wseq = b""
    for c in pixels:
        wc = wseq + bytes([c])
        if wc in table:
            wseq = wc
            continue
        emit(table[wseq])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
        wseq = bytes([c])
    if wseq:
        emit(table[wseq])
    emit(eoi)
    if nbits:
        bits.append(acc & 0xFF)
    out = bytearray([mcs])
    for i in range(0, len(bits), 255):
        blk = bits[i : i + 255]
        out += bytes([len(blk)]) + blk
    out += b"\x00"
    return bytes(out)


def _gif_animated(sw, sh, palette, frames, bg_idx=0):
    """Multi-frame GIF89a: ``frames`` = [(idx_array, left, top, disposal,
    transparent_index_or_None)], global palette only."""
    import numpy as np

    n = len(palette)
    gct_bits = (n.bit_length() - 1) - 1
    out = bytearray(b"GIF89a")
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | gct_bits, bg_idx, 0])
    out += bytes(np.asarray(palette, np.uint8).reshape(-1))
    mcs = max(2, (n - 1).bit_length())
    for idx, left, top, disposal, trans in frames:
        h, w = idx.shape
        gp = (disposal & 7) << 2 | (1 if trans is not None else 0)
        out += bytes([0x21, 0xF9, 4, gp, 0, 0, trans if trans is not None else 0, 0])
        out += b"\x2c" + left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
        out += _gif_lzw_blocks(bytes(idx.reshape(-1)), mcs)
    out += b"\x3b"
    return bytes(out)


def test_gif_animation_compositing():
    """Animated GIF through decode_video_frames: delta frames composite
    onto the canvas (transparent pixels keep the prior content), a
    sub-rectangle only repaints its rect, disposal 2 restores the
    background after the frame shows, disposal 3 restores the previous
    canvas — each frame checked against a plain-numpy oracle composite."""
    rng = np.random.RandomState(5)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)

    def g(canvas_idxless_rgb):
        c = canvas_idxless_rgb
        return 0.299 * c[:, :, 0] + 0.587 * c[:, :, 1] + 0.114 * c[:, :, 2]

    sw, sh = 10, 6
    f0 = rng.randint(1, 8, (sh, sw)).astype(np.uint8)      # full opaque base
    f1 = rng.randint(1, 8, (3, 4)).astype(np.uint8)        # delta at (2,1)
    f1[1, 1:3] = 0                                          # transparent holes
    f2 = rng.randint(1, 8, (2, 2)).astype(np.uint8)        # disposal-3 flash

    gif = _gif_animated(
        sw, sh, pal,
        [
            (f0, 0, 0, 1, None),      # draw, leave
            (f1, 2, 1, 2, 0),         # draw w/ transparency, then restore bg
            (f2, 7, 3, 3, None),      # draw, then restore previous
            (f0, 0, 0, 0, None),      # full redraw (proves state survived)
        ],
    )
    got = list(decode_video_frames(gif))
    assert [x[0] for x in got] == [0, 1, 2, 3]
    assert all((x[1], x[2]) == (sw, sh) for x in got)

    palf = pal.astype(np.float64)
    c0 = palf[f0]
    assert np.allclose(got[0][3], g(c0))

    c1 = c0.copy()
    patch = c1[1:4, 2:6]
    mask = f1 != 0
    patch[mask] = palf[f1][mask]
    assert np.allclose(got[1][3], g(c1))

    # disposal 2 after frame 1: its rect restores to background (pal[0])
    c2 = c1.copy()
    c2[1:4, 2:6] = palf[0]
    c2[3:5, 7:9] = palf[f2]
    assert np.allclose(got[2][3], g(c2))

    # disposal 3 after frame 2: its rect restores to pre-frame-2 state,
    # then frame 3 repaints everything with f0
    assert np.allclose(got[3][3], g(c0))

    # truncation mid-frame is a row-local ValueError
    with pytest.raises(ValueError):
        list(decode_video_frames(gif[: len(gif) // 2]))


def test_avi_audio_first_and_rec_lists():
    """Review findings: (1) stream order is unconstrained — an AVI whose
    AUDIO strl comes first must not have its WAVEFORMATEX misread as
    video dimensions (select the strl with strh fccType 'vids'); (2)
    interleaved AVIs wrap frame chunks in LIST 'rec ' sublists — they
    must be recursed into, not skipped (which silently yielded zero
    frames)."""
    rng = np.random.RandomState(3)
    w, h = 4, 3
    frames = [rng.randint(0, 255, (h, w, 3)).astype(np.uint8) for _ in range(2)]
    stride = (w * 3 + 3) & ~3
    strf_v = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + bytes(20)
    )
    # audio stream first: strf is a WAVEFORMATEX (not a BITMAPINFOHEADER)
    strf_a = (1).to_bytes(2, "little") + (2).to_bytes(2, "little") + \
        (44100).to_bytes(4, "little") + (176400).to_bytes(4, "little") + \
        (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", bytes(56))
        + _list(b"strl", _chunk(b"strh", b"auds" + bytes(52)) + _chunk(b"strf", strf_a))
        + _list(b"strl", _chunk(b"strh", b"vids" + bytes(52)) + _chunk(b"strf", strf_v)),
    )
    recs = b""
    for bgr in frames:
        rows = bytearray()
        for y in range(h - 1, -1, -1):
            rows += bytes(bgr[y].astype(np.uint8).tobytes()) + bytes(stride - w * 3)
        # each frame inside its own LIST 'rec ' sublist
        recs += _list(b"rec ", _chunk(b"00db", bytes(rows)))
    body = b"AVI " + hdrl + _list(b"movi", recs)
    avi = b"RIFF" + len(body).to_bytes(4, "little") + body

    got = list(decode_video_frames(avi))
    assert len(got) == 2
    for (idx, fw, fh, gray), bgr in zip(got, frames):
        assert (fw, fh) == (w, h)
        want = 0.299 * bgr[:, :, 2] + 0.587 * bgr[:, :, 1] + 0.114 * bgr[:, :, 0]
        assert np.allclose(gray, want)


def test_y4m_odd_dimensions_c420():
    """Review finding: C420 chroma planes are 2*ceil(w/2)*ceil(h/2)
    bytes — int(w*h*0.5) drifted the read position on odd dims and
    rejected valid clips as corrupt."""
    w, h = 3, 3
    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 255, (h, w)) for _ in range(3)]
    csize = 2 * ((w + 1) // 2) * ((h + 1) // 2)  # 8, not int(9*0.5)=4
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 C420jpeg\n".encode())
    for y in frames:
        out += b"FRAME\n" + bytes(np.asarray(y, np.uint8).tobytes()) + bytes(csize)
    got = list(decode_video_frames(bytes(out)))
    assert len(got) == 3
    for (idx, fw, fh, gray), y in zip(got, frames):
        assert (fw, fh) == (w, h) and np.array_equal(gray, y.astype(np.float64))


# --------------------------------------------------------------------- APNG


def _png_chunk(typ, data):
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_stream(px):
    """(h, w, ch) uint8 → filter-0 scanlines, zlib-compressed."""
    import zlib

    h = px.shape[0]
    raw = b"".join(b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h))
    return zlib.compress(raw)


def _apng(sw, sh, ctype, frames, idat_in_animation=True, actl_frames=None,
          fdat_seq_shift=0, default_px=None):
    """Build an APNG. frames: (px, x, y, dispose, blend) tuples; the first
    frame rides IDAT when ``idat_in_animation`` (its fcTL precedes IDAT),
    otherwise ``default_px`` is the non-animated default image and every
    frame is fcTL+fdAT."""
    import struct

    nch = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", sw, sh, 8, ctype, 0, 0, 0)
    )
    out += _png_chunk(
        b"acTL",
        struct.pack(">II", len(frames) if actl_frames is None else actl_frames, 0),
    )
    seq = 0

    def fctl(px, x, y, dispose, blend):
        nonlocal seq
        c = _png_chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB", seq, px.shape[1], px.shape[0], x, y, 1, 10,
                dispose, blend,
            ),
        )
        seq += 1
        return c

    rest = frames
    if idat_in_animation:
        px0, x0, y0, d0, b0 = frames[0]
        assert px0.shape == (sh, sw, nch) and x0 == 0 and y0 == 0
        out += fctl(px0, x0, y0, d0, b0) + _png_chunk(b"IDAT", _png_stream(px0))
        rest = frames[1:]
    else:
        out += _png_chunk(b"IDAT", _png_stream(default_px))
    for px, x, y, dispose, blend in rest:
        out += fctl(px, x, y, dispose, blend)
        out += _png_chunk(
            b"fdAT",
            struct.pack(">I", seq + fdat_seq_shift) + _png_stream(px),
        )
        seq += 1
    return out + _png_chunk(b"IEND", b"")


def _lum(rgb):
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def test_apng_composite_blend_and_background_dispose():
    """3-frame RGBA animation: full-canvas base, a SOURCE sub-rectangle
    whose BACKGROUND dispose clears its region to transparent, then an
    alpha-OVER pixel — canvas gray checked against hand-computed
    compositing at every frame."""
    sw = sh = 4
    f0 = np.zeros((4, 4, 4), np.uint8)
    f0[..., 0] = 100
    f0[..., 3] = 255
    f1 = np.zeros((2, 2, 4), np.uint8)
    f1[..., 1] = 200
    f1[..., 3] = 255
    f2 = np.zeros((1, 1, 4), np.uint8)
    f2[..., 2] = 255
    f2[..., 3] = 128
    payload = _apng(
        sw, sh, 6,
        [(f0, 0, 0, 0, 0), (f1, 1, 1, 1, 0), (f2, 0, 0, 0, 1)],
    )
    got = list(decode_video_frames(payload))
    assert [g[0] for g in got] == [0, 1, 2]
    assert all((g[1], g[2]) == (sw, sh) for g in got)

    base = _lum(np.array([100.0, 0.0, 0.0]))  # 29.9 everywhere
    want0 = np.full((4, 4), base)
    assert np.allclose(got[0][3], want0)

    want1 = want0.copy()
    want1[1:3, 1:3] = _lum(np.array([0.0, 200.0, 0.0]))
    assert np.allclose(got[1][3], want1)

    # frame 1's region disposed to transparent (gray 0), then (0,0) gets
    # straight-alpha OVER of (0,0,255,128) onto opaque (100,0,0)
    sa = 128.0 / 255.0
    over = _lum(np.array([100.0 * (1 - sa), 0.0, 255.0 * sa]))
    want2 = want0.copy()
    want2[1:3, 1:3] = 0.0
    want2[0, 0] = over
    assert np.allclose(got[2][3], want2)


def test_apng_dispose_previous_restores_region():
    """dispose_op=2: after the sub-frame, its region reverts to the
    pre-frame canvas."""
    sw = sh = 3
    f0 = np.full((3, 3, 3), 50, np.uint8)
    f1 = np.full((2, 2, 3), 250, np.uint8)
    f2 = np.full((1, 1, 3), 10, np.uint8)
    payload = _apng(
        sw, sh, 2,
        [(f0, 0, 0, 0, 0), (f1, 0, 0, 2, 0), (f2, 2, 2, 0, 0)],
    )
    got = list(decode_video_frames(payload))
    assert len(got) == 3
    g50, g250, g10 = (_lum(np.array([v, v, v], float)) for v in (50, 250, 10))
    want1 = np.full((3, 3), g50)
    want1[0:2, 0:2] = g250
    assert np.allclose(got[1][3], want1)
    want2 = np.full((3, 3), g50)  # f1's region restored
    want2[2, 2] = g10
    assert np.allclose(got[2][3], want2)


def test_apng_default_image_not_in_animation():
    """No fcTL before IDAT: the IDAT image is the still fallback only;
    the animation is the fdAT frames, composited onto a TRANSPARENT
    canvas (gray 0 outside the first frame's rectangle)."""
    sw = sh = 3
    still = np.full((3, 3, 3), 77, np.uint8)
    f0 = np.full((2, 2, 3), 200, np.uint8)
    payload = _apng(
        sw, sh, 2, [(f0, 1, 1, 0, 0)],
        idat_in_animation=False, default_px=still,
    )
    got = list(decode_video_frames(payload))
    assert len(got) == 1
    want = np.zeros((3, 3))
    want[1:3, 1:3] = _lum(np.array([200.0, 200.0, 200.0]))
    assert np.allclose(got[0][3], want)


def test_apng_sequence_gap_and_count_mismatch_raise():
    sw = sh = 2
    f0 = np.full((2, 2, 3), 9, np.uint8)
    f1 = np.full((1, 1, 3), 9, np.uint8)
    frames = [(f0, 0, 0, 0, 0), (f1, 0, 0, 0, 0)]
    with pytest.raises(ValueError, match="sequence gap"):
        list(decode_video_frames(_apng(sw, sh, 2, frames, fdat_seq_shift=1)))
    with pytest.raises(ValueError, match="acTL declares"):
        list(decode_video_frames(_apng(sw, sh, 2, frames, actl_frames=5)))
    bad = _apng(sw, sh, 2, [(np.full((2, 2, 3), 1, np.uint8), 1, 1, 0, 0)],
                idat_in_animation=False, default_px=f0)
    with pytest.raises(ValueError, match="outside the canvas"):
        list(decode_video_frames(bad))


def test_plain_png_yields_one_still_frame():
    """A PNG without acTL iterates as a single-frame video whose gray
    matches the still decoder (the GIF87a convention)."""
    from french_admin_etl_spark.operators.multimodal import decode_image

    import struct

    px = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _png_stream(px))
        + _png_chunk(b"IEND", b"")
    )
    got = list(decode_video_frames(payload))
    assert len(got) == 1
    w, h, gray = decode_image(payload)
    assert got[0][1:3] == (w, h)
    assert np.allclose(got[0][3], gray)


def test_apng_actl_without_frames_raises():
    """Review finding: acTL declaring 0 frames with no fcTL yielded
    NOTHING — the media row vanished with neither frames nor an err."""
    import struct

    px = np.zeros((2, 2, 3), np.uint8)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"acTL", struct.pack(">II", 0, 0))
        + _png_chunk(b"IDAT", _png_stream(px))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="no animation frames"):
        list(decode_video_frames(payload))


def test_truncated_trailing_chunk_parity_with_still_decoder():
    """Review finding: the video path's chunk walk was STRICT about a
    truncated trailing ancillary chunk while the still decoder was
    lenient — the same payload decoded as an image but errored as a
    video. Both now share one walk (multimodal._png_chunk_iter)."""
    import struct

    from french_admin_etl_spark.operators.multimodal import decode_image

    px = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    good = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", _png_stream(px))
    )
    # a tEXt chunk whose declared length exceeds the remaining bytes
    truncated = good + (20).to_bytes(4, "big") + b"tEXthalf"
    w, h, gray = decode_image(truncated)  # still path: lenient
    got = list(decode_video_frames(truncated))  # video path: same payload
    assert len(got) == 1 and got[0][1:3] == (w, h)
    assert np.allclose(got[0][3], gray)
