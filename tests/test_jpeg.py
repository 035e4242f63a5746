"""Baseline JPEG decoder, verified by round-trip against a from-scratch
encoder built HERE (forward DCT + canonical Huffman + byte stuffing +
restart markers) — no golden bytes from any external tool, so the test
pins the T.81 wire format itself, not a library's output."""

import numpy as np
import pytest

from french_admin_etl_spark.operators.jpeg import (
    _QE,
    ZIGZAG,
    dct_matrix,
    decode_jpeg,
    decode_jpeg_gray,
)

C = dct_matrix()


# --------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, val: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):  # pad to byte boundary with 1-bits (T.81 F.1.2.3)
        while self.n:
            self.write(1, 1)


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _mag(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _pad_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to bh*8 x bw*8."""
    out = np.empty((bh * 8, bw * 8))
    h, w = plane.shape
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _zig(natural64: np.ndarray) -> np.ndarray:
    return natural64[ZIGZAG]


def _block_tokens(qzig: np.ndarray, pred: int):
    toks = []
    diff = int(qzig[0]) - pred
    t = _cat(diff)
    toks.append(("dc", t, _mag(diff, t), t))
    run = 0
    for k in range(1, 64):
        v = int(qzig[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            toks.append(("ac", 0xF0, 0, 0))
            run -= 16
        s = _cat(v)
        toks.append(("ac", (run << 4) | s, _mag(v, s), s))
        run = 0
    if run:
        toks.append(("ac", 0x00, 0, 0))  # EOB
    return toks, int(qzig[0])


def _canonical(symbols):
    """Equal-length canonical table over the used symbols (leaves the
    all-ones code unused, as T.81 requires of encoders)."""
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) < len(syms) + 1:
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: (i, L) for i, s in enumerate(syms)}
    return counts, syms, codes


def encode_jpeg(planes, w, h, factors, qt_of, qtabs, dri=0, prec=8):
    """Minimal baseline encoder. ``planes``: coded-resolution float
    arrays [0,255]; ``factors``: [(h_i, v_i)]; ``qt_of``: quant-table id
    per component; ``qtabs``: {id: 8x8 natural-order array}. Component
    0 uses Huffman tables 0, the rest table 1 (JFIF convention).
    ``prec=12`` emits EXTENDED sequential (SOF1, level shift 2048,
    16-bit DQT when a table value exceeds 255)."""
    nc = len(planes)
    level = float(1 << (prec - 1))
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    if nc > 1:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        units = [(i, factors[i][0], factors[i][1]) for i in range(nc)]
    else:
        mcus_x = -(-planes[0].shape[1] // 8)
        mcus_y = -(-planes[0].shape[0] // 8)
        units = [(0, 1, 1)]
    padded = []
    for i, hu, vu in units:
        padded.append(_pad_blocks(planes[i], mcus_y * vu, mcus_x * hu))

    # pass 1: quantize + tokenize in scan order, restart-aware
    all_toks = []  # list per MCU: list of (comp, tokens)
    pred = [0] * nc
    for mi in range(mcus_x * mcus_y):
        if dri and mi and mi % dri == 0:
            pred = [0] * nc
        my, mx = divmod(mi, mcus_x)
        mcu = []
        for ui, (i, hu, vu) in enumerate(units):
            q = qtabs[qt_of[i]]
            for v in range(vu):
                for hh in range(hu):
                    y0, x0 = (my * vu + v) * 8, (mx * hu + hh) * 8
                    blk = padded[ui][y0 : y0 + 8, x0 : x0 + 8]
                    x = C @ (blk - level) @ C.T
                    qzig = _zig(np.round(x / q).astype(np.int64).reshape(64).copy())
                    toks, dc = _block_tokens(qzig, pred[i])
                    pred[i] = dc
                    mcu.append((i, toks))
        all_toks.append(mcu)

    # pass 2: canonical tables per (class, table id 0|1)
    used = {("dc", 0): [], ("ac", 0): [], ("dc", 1): [], ("ac", 1): []}
    for mcu in all_toks:
        for ci, toks in mcu:
            tid = 0 if ci == 0 else 1
            for cls, sym, _mb, _nb in toks:
                used[(cls, tid)].append(sym)
    tables = {k: _canonical(v) for k, v in used.items() if v}

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    for tid, q in qtabs.items():
        qz = q.reshape(64)[ZIGZAG].astype(int)
        if int(qz.max()) > 255:  # Pq=1: 16-bit table (12-bit precision only)
            seg(0xDB, bytes([0x10 | tid]) + b"".join(int(x).to_bytes(2, "big") for x in qz))
        else:
            seg(0xDB, bytes([tid]) + bytes(int(x) for x in qz))
    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (factors[i][0] << 4) | factors[i][1], qt_of[i]])
    seg(0xC0 if prec == 8 else 0xC1, sof)
    for (cls, tid), (counts, syms, _codes) in sorted(tables.items()):
        tc = 0 if cls == "dc" else 1
        seg(0xC4, bytes([(tc << 4) | tid]) + bytes(counts) + bytes(syms))
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    sos = bytes([nc])
    for i in range(nc):
        tid = 0 if i == 0 else 1
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()
    for mi, mcu in enumerate(all_toks):
        if dri and mi and mi % dri == 0:
            bw.align()
            out.extend(bw.out)
            out.extend(bytes([0xFF, 0xD0 + ((mi // dri - 1) % 8)]))
            bw = _BitWriter()
        for ci, toks in mcu:
            tid = 0 if ci == 0 else 1
            for cls, sym, mb, nb in toks:
                code, ln = tables[(cls, tid)][2][sym]
                bw.write(code, ln)
                if nb:
                    bw.write(mb, nb)
    bw.align()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _img(h, w, seed=0):
    """Deterministic mid-range test image (avoids clamp nonlinearity)."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 110 + 60 * np.sin(xx / 5.0) + 40 * np.cos(yy / 7.0)
    return np.clip(base + rng.randint(-10, 11, (h, w)), 40, 215).astype(np.float64)


# ---------------------------------------------------------------- tests


def test_gray_near_lossless_roundtrip():
    img = _img(17, 24)  # not multiples of 8: exercises edge padding/crop
    q1 = np.ones((8, 8))
    payload = encode_jpeg([img], 24, 17, [(1, 1)], [0], {0: q1})
    w, h, gray = decode_jpeg_gray(payload)
    assert (w, h) == (24, 17) and gray.shape == (17, 24)
    # q=1: error is pure DCT rounding, bounded well under one gray level
    assert np.max(np.abs(gray - img)) <= 2.0


def test_color_444_all_planes_within_quant_error():
    y, cb, cr = _img(16, 16, 1), _img(16, 16, 2), _img(16, 16, 3)
    q = {0: np.full((8, 8), 8.0), 1: np.full((8, 8), 12.0)}
    payload = encode_jpeg([y, cb, cr], 16, 16, [(1, 1)] * 3, [0, 1, 1], q)
    w, h, planes = decode_jpeg(payload)
    assert (w, h) == (16, 16) and [p.shape for p in planes] == [(16, 16)] * 3
    for p, src, qv in zip(planes, (y, cb, cr), (8.0, 12.0, 12.0)):
        rmse = float(np.sqrt(np.mean((p - src) ** 2)))
        assert rmse <= qv / 2 + 0.5, rmse
    # the gray entry point returns the luma plane
    assert np.array_equal(decode_jpeg_gray(payload)[2], planes[0])


def test_chroma_420_subsampled_planes():
    y = _img(24, 32, 4)
    cb = _img(12, 16, 5)  # coded (subsampled) resolution
    cr = _img(12, 16, 6)
    q = {0: np.full((8, 8), 4.0), 1: np.full((8, 8), 6.0)}
    payload = encode_jpeg(
        [y, cb, cr], 32, 24, [(2, 2), (1, 1), (1, 1)], [0, 1, 1], q
    )
    w, h, planes = decode_jpeg(payload)
    assert (w, h) == (32, 24)
    assert planes[0].shape == (24, 32)
    assert planes[1].shape == (12, 16) and planes[2].shape == (12, 16)
    for p, src, qv in zip(planes, (y, cb, cr), (4.0, 6.0, 6.0)):
        assert float(np.sqrt(np.mean((p - src) ** 2))) <= qv / 2 + 0.5


def test_restart_markers_change_nothing():
    img = _img(24, 40, 7)
    q = {0: np.full((8, 8), 4.0)}
    plain = encode_jpeg([img], 40, 24, [(1, 1)], [0], {0: q[0]})
    with_rst = encode_jpeg([img], 40, 24, [(1, 1)], [0], {0: q[0]}, dri=2)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    a = decode_jpeg_gray(plain)[2]
    b = decode_jpeg_gray(with_rst)[2]
    # same quantized coefficients → bit-identical reconstruction
    assert np.array_equal(a, b)


def test_unsupported_modes_and_garbage_rejected():
    img = _img(8, 8)
    payload = bytearray(encode_jpeg([img], 8, 8, [(1, 1)], [0], {0: np.ones((8, 8))}))
    i = payload.index(b"\xff\xc0")
    # SOF0 → SOF5 (differential sequential) without a DHP segment is a
    # MALFORMED hierarchical stream — rejected loudly
    payload[i + 1] = 0xC5
    with pytest.raises(ValueError, match="DHP"):
        decode_jpeg(bytes(payload))
    # SOF0 → SOF3 makes a MALFORMED lossless file (its baseline scan
    # header has Ss=0, not a predictor 1-7) — rejected loudly
    payload[i + 1] = 0xC3
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(payload))
    # SOF0 → SOF2 marker alone makes a MALFORMED progressive file (its one
    # scan is a baseline Ss=0..Se=63 interleave, illegal for progressive
    # DC) — rejected loudly, never mis-decoded
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        # SOI but then truncated mid-stream
        decode_jpeg(bytes(encode_jpeg([img], 8, 8, [(1, 1)], [0], {0: np.ones((8, 8))}))[:40])


def test_jpeg_flows_through_feature_pipeline(spark):
    """e2e: a JPEG payload decodes inside mapInPandas next to a PGM one,
    producing dims + 8x8 thumbnail with no err (S9 isolation intact for
    a corrupt row)."""
    from french_admin_etl_spark.operators.multimodal import extract_image_features

    img = _img(16, 16, 8)
    jpg = encode_jpeg([img], 16, 16, [(1, 1)], [0], {0: np.ones((8, 8))})
    pgm = b"P5\n16 16\n255\n" + bytes(np.clip(img, 0, 255).astype(np.uint8))
    rows = [
        (1, "image", bytearray(jpg)),
        (2, "image", bytearray(pgm)),
        (3, "image", bytearray(b"\xff\xd8junk")),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r["media_id"]: r
        for r in extract_image_features(df, decode_stub=False).collect()
    }
    assert got[1]["err"] is None and (got[1]["width"], got[1]["height"]) == (16, 16)
    assert got[2]["err"] is None
    # near-lossless JPEG of the same image ⇒ nearly the same thumbnail
    f1 = np.array(got[1]["feature"])
    f2 = np.array(got[2]["feature"])
    assert f1.shape == f2.shape and np.max(np.abs(f1 - f2)) <= 3.0
    assert got[3]["err"] is not None  # corrupt row dead-letters, batch survives


def encode_jpeg_per_component(planes, w, h, factors, qt_of, qtabs):
    """Non-interleaved encoder variant: one SOS per component, each scan
    rastering its component's OWN block grid, DC predictor reset per scan
    (T.81 A.2.2) — the multi-scan baseline shape decode_jpeg must handle."""
    nc = len(planes)
    # tokenize each component independently
    per_comp_toks = []
    for i in range(nc):
        p = planes[i]
        bh, bw_ = -(-p.shape[0] // 8), -(-p.shape[1] // 8)
        padded = _pad_blocks(p, bh, bw_)
        toks = []
        pred = 0
        q = qtabs[qt_of[i]]
        for bi in range(bh * bw_):
            by, bx = divmod(bi, bw_)
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            x = C @ (blk - 128.0) @ C.T
            qzig = _zig(np.round(x / q).astype(np.int64).reshape(64).copy())
            t, dc = _block_tokens(qzig, pred)
            pred = dc
            toks.append(t)
        per_comp_toks.append(toks)

    used = {("dc", 0): [], ("ac", 0): [], ("dc", 1): [], ("ac", 1): []}
    for i, toks in enumerate(per_comp_toks):
        tid = 0 if i == 0 else 1
        for blk in toks:
            for cls, sym, _mb, _nb in blk:
                used[(cls, tid)].append(sym)
    tables = {k: _canonical(v) for k, v in used.items() if v}

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    for tid, q in qtabs.items():
        qz = q.reshape(64)[ZIGZAG].astype(int)
        seg(0xDB, bytes([tid]) + bytes(int(x) for x in qz))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (factors[i][0] << 4) | factors[i][1], qt_of[i]])
    seg(0xC0, sof)
    for (cls, tid), (counts, syms, _codes) in sorted(tables.items()):
        tc = 0 if cls == "dc" else 1
        seg(0xC4, bytes([(tc << 4) | tid]) + bytes(counts) + bytes(syms))
    for i in range(nc):  # one scan per component
        tid = 0 if i == 0 else 1
        seg(0xDA, bytes([1, i + 1, (tid << 4) | tid, 0, 63, 0]))
        bw = _BitWriter()
        for blk in per_comp_toks[i]:
            for cls, sym, mb, nb in blk:
                code, ln = tables[(cls, tid)][2][sym]
                bw.write(code, ln)
                if nb:
                    bw.write(mb, nb)
        bw.align()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_multi_scan_non_interleaved_color_decodes_all_planes():
    """A baseline color file coded as one scan PER COMPONENT must decode
    every plane (ADVICE: the single-SOS parse returned zero chroma). The
    result must equal the interleaved encoding of the same source within
    quantization error, and chroma must be genuinely non-zero."""
    y, cb, cr = _img(16, 16, 1), _img(16, 16, 2), _img(16, 16, 3)
    q = {0: np.full((8, 8), 8.0), 1: np.full((8, 8), 12.0)}
    multi = encode_jpeg_per_component([y, cb, cr], 16, 16, [(1, 1)] * 3, [0, 1, 1], q)
    w, h, planes = decode_jpeg(multi)
    assert (w, h) == (16, 16) and [p.shape for p in planes] == [(16, 16)] * 3
    for p, src, qv in zip(planes, (y, cb, cr), (8.0, 12.0, 12.0)):
        rmse = float(np.sqrt(np.mean((p - src) ** 2)))
        assert rmse <= qv / 2 + 0.5, rmse
    assert float(np.mean(planes[1])) > 10.0  # chroma is real, not zeros
    # interleaved vs multi-scan: same source, same tables family → planes
    # agree bit-for-bit is not required, but must agree to quant error
    inter = encode_jpeg([y, cb, cr], 16, 16, [(1, 1)] * 3, [0, 1, 1], q)
    _, _, ip = decode_jpeg(inter)
    for a, b in zip(planes, ip):
        assert float(np.max(np.abs(a - b))) <= 1e-6  # same quantized coefficients


def test_multi_scan_subsampled_and_odd_dims():
    """Per-component scans with 4:2:0 subsampling and non-multiple-of-MCU
    dims: the single-component scan rasters its own block grid, which is
    smaller than the MCU grid — geometry must still line up."""
    yp = _img(24, 36, 6)
    cbp, crp = _img(12, 18, 7), _img(12, 18, 8)
    q = {0: np.ones((8, 8)), 1: np.ones((8, 8))}
    multi = encode_jpeg_per_component(
        [yp, cbp, crp], 36, 24, [(2, 2), (1, 1), (1, 1)], [0, 1, 1], q
    )
    w, h, planes = decode_jpeg(multi)
    assert (w, h) == (36, 24)
    assert planes[0].shape == (24, 36) and planes[1].shape == (12, 18)
    for p, src in zip(planes, (yp, cbp, crp)):
        assert float(np.max(np.abs(p - src))) <= 2.0


def test_component_missing_scan_raises():
    """A color file whose trailing chroma scans were truncated away must
    raise, not return fabricated zero planes."""
    y, cb, cr = _img(16, 16, 1), _img(16, 16, 2), _img(16, 16, 3)
    q = {0: np.ones((8, 8)), 1: np.ones((8, 8))}
    multi = encode_jpeg_per_component([y, cb, cr], 16, 16, [(1, 1)] * 3, [0, 1, 1], q)
    # cut right after the FIRST scan's entropy data: find the 2nd SOS
    first_sos = multi.index(b"\xff\xda")
    second_sos = multi.index(b"\xff\xda", first_sos + 2)
    truncated = multi[:second_sos] + b"\xff\xd9"
    with pytest.raises(ValueError, match="no scan covered"):
        decode_jpeg(truncated)


# ------------------------------------------------------ progressive encoder


def _quantize_blocks(planes, w, h, factors, qt_of, qtabs, prec=8):
    """Per-component MCU-grid-padded quantized zigzag blocks (int64[by,bx,64])."""
    level = float(1 << (prec - 1))
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x, mcus_y = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    out = []
    for i, (hu, vu) in enumerate(factors):
        by, bx = mcus_y * vu, mcus_x * hu
        padded = _pad_blocks(planes[i], by, bx)
        q = qtabs[qt_of[i]]
        arr = np.empty((by, bx, 64), dtype=np.int64)
        for yy in range(by):
            for xx in range(bx):
                blk = padded[yy * 8 : yy * 8 + 8, xx * 8 : xx * 8 + 8]
                x = C @ (blk - level) @ C.T
                arr[yy, xx] = _zig(np.round(x / q).astype(np.int64).reshape(64).copy())
        out.append(arr)
    return out, mcus_x, mcus_y


def _scan_ops_dc_first(qblocks, comps, factors, mcus_x, mcus_y, al):
    ops, pred = [], {i: 0 for i in comps}
    for mi in range(mcus_x * mcus_y):
        my, mx = divmod(mi, mcus_x)
        for i in comps:
            hu, vu = factors[i]
            for v in range(vu):
                for hh in range(hu):
                    shifted = int(qblocks[i][my * vu + v, mx * hu + hh, 0]) >> al
                    diff = shifted - pred[i]
                    pred[i] = shifted
                    t = _cat(diff)
                    ops.append(("h", t, _mag(diff, t), t))
    return ops


def _scan_ops_dc_refine(qblocks, comps, factors, mcus_x, mcus_y, al):
    ops = []
    for mi in range(mcus_x * mcus_y):
        my, mx = divmod(mi, mcus_x)
        for i in comps:
            hu, vu = factors[i]
            for v in range(vu):
                for hh in range(hu):
                    ops.append(
                        ("b", (int(qblocks[i][my * vu + v, mx * hu + hh, 0]) >> al) & 1, 1)
                    )
    return ops


def _comp_grid(i, w, h, factors):
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    cw = -(-(w * factors[i][0]) // hmax)
    ch = -(-(h * factors[i][1]) // vmax)
    return -(-ch // 8), -(-cw // 8)  # (bys, bxs): the COMPONENT block grid


def _scan_ops_ac_first(qb, bys, bxs, ss, se, al):
    ops, eobrun = [], [0]

    def flush_eob():
        if eobrun[0]:
            t = eobrun[0].bit_length() - 1
            ops.append(("h", t << 4, eobrun[0] - (1 << t), t))
            eobrun[0] = 0

    for bi in range(bys * bxs):
        by, bx = divmod(bi, bxs)
        band = [int(v) for v in qb[by, bx, ss : se + 1]]
        red = [(1 if v > 0 else -1) * (abs(v) >> al) for v in band]
        if all(x == 0 for x in red):
            eobrun[0] += 1
            if eobrun[0] == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for x in red:
            if x == 0:
                r += 1
                continue
            while r > 15:
                ops.append(("h", 0xF0, 0, 0))
                r -= 16
            s = _cat(x)
            ops.append(("h", (r << 4) | s, _mag(x, s), s))
            r = 0
        if r:
            eobrun[0] += 1
    flush_eob()
    return ops


def _scan_ops_ac_refine(qb, bys, bxs, ss, se, al):
    """IJG encode_mcu_AC_refine structure. TWO correction-bit buffers,
    matching the decoder's read order exactly:

    - ``be``: bits belonging to blocks already folded into the pending
      EOB run — the decoder reads them right after the EOBn symbol (its
      per-block remainder loop), so they flush WITH the EOBn;
    - ``br``: bits buffered inside the CURRENT block since the last
      symbol — the decoder reads them while advancing past
      nonzero-history coeffs AFTER the next ZRL / newly-significant
      symbol, so they flush right after that symbol (and its sign bit).

    A block that ends with trailing zeros/corrections joins the EOB run:
    its ``br`` migrates into ``be``. (Lumping the two buffers desyncs the
    stream as soon as an EOB run is broken by a block whose band starts
    with corrections — found by the scripted-bits harness below.)"""
    ops, eobrun, be, br = [], [0], [], []

    def flush_br():
        ops.extend(("b", b, 1) for b in br)
        br.clear()

    def flush_eob():
        if eobrun[0]:
            t = eobrun[0].bit_length() - 1
            ops.append(("h", t << 4, eobrun[0] - (1 << t), t))
            eobrun[0] = 0
            ops.extend(("b", b, 1) for b in be)
            be.clear()

    for bi in range(bys * bxs):
        by, bx = divmod(bi, bxs)
        band = [int(v) for v in qb[by, bx, ss : se + 1]]
        absv = [abs(v) >> al for v in band]
        # EOB = last newly-significant position; zero runs past it fold
        # into the EOB run instead of ZRLs
        eob_idx = max((i for i, a in enumerate(absv) if a == 1), default=-1)
        r = 0
        for idx, a in enumerate(absv):
            if a == 0:
                r += 1
                continue
            # pending ZRLs flush before ANY nonzero (correction positions
            # included): the decoder reads correction bits as it advances
            # past nonzero-history coeffs within EACH ZRL's 16-position
            # group, so group alignment matters (IJG; a straight read of
            # figure G.7 misses this)
            while r > 15 and idx <= eob_idx:
                flush_eob()
                ops.append(("h", 0xF0, 0, 0))
                r -= 16
                flush_br()
            if a > 1:  # already significant: one correction bit
                br.append(a & 1)
                continue
            # a == 1: newly significant this pass
            flush_eob()
            ops.append(("h", (r << 4) | 1, 0, 0))
            ops.append(("b", 1 if band[idx] > 0 else 0, 1))
            flush_br()
            r = 0
        if r > 0 or br:
            eobrun[0] += 1
            be.extend(br)
            br.clear()
            if eobrun[0] == 0x7FFE:
                flush_eob()
    flush_eob()
    return ops


def encode_jpeg_progressive(planes, w, h, factors, qt_of, qtabs, script=None, prec=8):
    """Progressive (SOF2) encoder: spectral selection + successive
    approximation, per-scan DHT redefinition, EOB run-lengths — the wire
    shapes of T.81 annex G, built from scratch so the decoder round-trip
    pins the format, not a library."""
    nc = len(planes)
    qblocks, mcus_x, mcus_y = _quantize_blocks(planes, w, h, factors, qt_of, qtabs, prec)
    if script is None:
        if nc == 1:
            script = [
                ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
            ]
        else:
            script = [
                (list(range(nc)), 0, 0, 0, 1),
                ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                (list(range(nc)), 0, 0, 1, 0),
                ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
            ]
    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    for tid, q in qtabs.items():
        qz = q.reshape(64)[ZIGZAG].astype(int)
        seg(0xDB, bytes([tid]) + bytes(int(x) for x in qz))
    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (factors[i][0] << 4) | factors[i][1], qt_of[i]])
    seg(0xC2, sof)

    for comps, ss, se, ah, al in script:
        if ss == 0:
            ops = (
                _scan_ops_dc_first(qblocks, comps, factors, mcus_x, mcus_y, al)
                if ah == 0
                else _scan_ops_dc_refine(qblocks, comps, factors, mcus_x, mcus_y, al)
            )
        else:
            assert len(comps) == 1
            bys, bxs = _comp_grid(comps[0], w, h, factors)
            fn = _scan_ops_ac_first if ah == 0 else _scan_ops_ac_refine
            ops = fn(qblocks[comps[0]], bys, bxs, ss, se, al)
        syms = [op[1] for op in ops if op[0] == "h"]
        codes = None
        if syms:
            counts, symlist, codes = _canonical(syms)
            tc = 0 if ss == 0 else 1
            seg(0xC4, bytes([(tc << 4) | 0]) + bytes(counts) + bytes(symlist))
        sos = bytes([len(comps)])
        for i in comps:
            sos += bytes([i + 1, 0])  # td=0, ta=0 (redefined per scan)
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)
        bw = _BitWriter()
        for op in ops:
            if op[0] == "h":
                _k, sym, extra, nbits = op
                code, ln = codes[sym]
                bw.write(code, ln)
                if nbits:
                    bw.write(extra, nbits)
            else:
                bw.write(op[1], op[2])
        bw.align()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ------------------------------------------------------ progressive tests


def test_progressive_color_420_equals_sequential():
    """Full progressive script (spectral selection + DC and AC successive
    approximation + EOB runs) over a 4:2:0 color image: the decoded
    planes must EXACTLY equal the baseline encoding's decode of the same
    source (identical quantized coefficients -> identical IDCT)."""
    y = _img(24, 36, 10)
    cb, cr = _img(12, 18, 11), _img(12, 18, 12)
    q = {0: np.full((8, 8), 4.0), 1: np.full((8, 8), 6.0)}
    factors = [(2, 2), (1, 1), (1, 1)]
    prog = encode_jpeg_progressive([y, cb, cr], 36, 24, factors, [0, 1, 1], q)
    seqb = encode_jpeg([y, cb, cr], 36, 24, factors, [0, 1, 1], q)
    wp, hp, pp = decode_jpeg(prog)
    ws, hs, ps = decode_jpeg(seqb)
    assert (wp, hp) == (ws, hs) == (36, 24)
    for a, b in zip(pp, ps):
        assert a.shape == b.shape
        assert float(np.max(np.abs(a - b))) <= 1e-9


def test_progressive_spectral_only_gray():
    """Spectral-selection-only progressive (no successive approximation):
    three scans (DC, AC 1-5, AC 6-63) reassemble the exact coefficients."""
    img = _img(17, 29, 13)  # non-multiples of 8: padding + crop path
    q1 = np.ones((8, 8))
    prog = encode_jpeg_progressive(
        [img], 29, 17, [(1, 1)], [0], {0: q1},
        script=[([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0), ([0], 6, 63, 0, 0)],
    )
    w, h, gray = decode_jpeg_gray(prog)
    assert (w, h) == (29, 17) and gray.shape == (17, 29)
    assert float(np.max(np.abs(gray - img))) <= 2.0  # q=1: pure DCT rounding


def test_progressive_missing_dc_scan_raises():
    """Chroma without any DC scan is undecodable — must raise, not emit
    fabricated planes (same coverage rule as multi-scan baseline)."""
    y, cb, cr = _img(16, 16, 1), _img(16, 16, 2), _img(16, 16, 3)
    q = {0: np.ones((8, 8)), 1: np.ones((8, 8))}
    prog = encode_jpeg_progressive(
        [y, cb, cr], 16, 16, [(1, 1)] * 3, [0, 1, 1], q,
        script=[([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],  # luma only
    )
    with pytest.raises(ValueError, match="no scan covered"):
        decode_jpeg(prog)


def test_progressive_partial_ac_is_legal_preview():
    """DC-only progressive (the first bytes a browser renders): decodes,
    and equals the DC-only reconstruction (block means)."""
    img = _img(16, 16, 14)
    q1 = np.ones((8, 8))
    prog = encode_jpeg_progressive(
        [img], 16, 16, [(1, 1)], [0], {0: q1}, script=[([0], 0, 0, 0, 0)],
    )
    w, h, gray = decode_jpeg_gray(prog)
    assert (w, h) == (16, 16)
    # each 8x8 tile must be flat at (roughly) the tile mean
    for by in range(2):
        for bx in range(2):
            tile = gray[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert float(np.ptp(tile)) <= 1e-9
            src = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            assert abs(float(tile[0, 0]) - float(np.mean(src))) <= 1.0


# ------------------------------------------------------- lossless encoder


def encode_jpeg_lossless(
    planes, w, h, predictor, prec=8, pt=0, dri=0, per_component=False,
    sampling=None,
):
    """Lossless (SOF3) encoder per T.81 annex H: predictor DPCM, Huffman
    category coding with the DC table machinery (SSSS 0..16, 16 = diff
    32768 with no magnitude bits), restart markers resetting prediction
    to 2^(P-Pt-1). ``planes``: int arrays of ALREADY point-transformed
    samples (< 2**prec), each sized (yi, xi) per A.1.1 for its
    component's ``sampling`` factor (default 1x1 → (h, w)). One shared
    Huffman table id 0. ``per_component=True`` emits one SOS per
    component (non-interleaved: restart interval counts samples).
    Interleaved scans pad each plane to the MCU grid by edge
    replication; the decoder crops back."""
    nc = len(planes)
    sampling = sampling or [(1, 1)] * nc
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // hmax), -(-h // vmax)
    dims, padded = [], []
    for p, (hi, vi) in zip(planes, sampling):
        xi, yi = -(-(w * hi) // hmax), -(-(h * vi) // vmax)
        arr = np.asarray(p, dtype=np.int64)
        assert arr.shape == (yi, xi), (arr.shape, (yi, xi))
        dims.append((xi, yi))
        padded.append(
            np.pad(arr, ((0, mcuy * vi - yi), (0, mcux * hi - xi)), "edge")
        )
    default = 1 << (prec - pt - 1)

    def diffs_for(order):
        """order: list of component indices per MCU (interleaved) or a
        single component (per-component scan). Yields (comp, token)."""
        # unit entry: (comp, row, col, first-sample-of-its-MCU-region)
        if len(order) == 1:
            ci = order[0]
            xi, yi = dims[ci]
            units = [[(ci, m // xi, m % xi, True)] for m in range(xi * yi)]
        else:
            units = []
            for m in range(mcux * mcuy):
                mr, mc = divmod(m, mcux)
                unit = []
                for ci in order:
                    hi, vi = sampling[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            unit.append(
                                (ci, mr * vi + v, mc * hi + hh,
                                 v == 0 and hh == 0)
                            )
                units.append(unit)
        toks = []
        seg_start, first_row = 0, {}
        for m, unit in enumerate(units):
            if dri and m and m % dri == 0:
                toks.append(("rst", None, None, None))
                seg_start = m
            if m == seg_start:
                # each component's first sample ROW of this interval
                first_row = {s[0]: s[1] for s in unit if s[3]}
            for ci, r, c, first in unit:
                p = padded[ci]
                if predictor == 0:  # differential frame: no prediction
                    px = 0
                elif m == seg_start and first:
                    px = default
                elif r == first_row[ci]:
                    px = int(p[r, c - 1])  # Ra on the interval's first row
                elif c == 0:
                    px = int(p[r - 1, c])
                else:
                    ra, rb = int(p[r, c - 1]), int(p[r - 1, c])
                    rc = int(p[r - 1, c - 1])
                    px = {
                        1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                d = (int(p[r, c]) - px) & 0xFFFF
                if d == 32768:
                    toks.append((ci, 16, 0, 0))
                else:
                    if d > 32768:
                        d -= 65536
                    s = _cat(d)
                    toks.append((ci, s, _mag(d, s), s))
        return toks

    scans = (
        [diffs_for([ci]) for ci in range(nc)]
        if per_component
        else [diffs_for(list(range(nc)))]
    )
    counts, syms, codes = _canonical(
        [t[1] for toks in scans for t in toks if t[0] != "rst"]
    )

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        hi, vi = sampling[i]
        sof += bytes([i + 1, (hi << 4) | vi, 0])  # Tq unused in lossless
    seg(0xC3, sof)
    seg(0xC4, bytes([0x00]) + bytes(counts) + bytes(syms))
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    for si, toks in enumerate(scans):
        comp_ids = sorted({t[0] + 1 for t in toks if t[0] != "rst"})
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, AhAl=Pt
        seg(0xDA, sos)
        bw = _BitWriter()
        rst = 0
        for t in toks:
            if t[0] == "rst":
                bw.align()
                out.extend(bw.out)
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                bw = _BitWriter()
                continue
            _ci, sym, mb, nb = t
            code, ln = codes[sym]
            bw.write(code, ln)
            if nb:
                bw.write(mb, nb)
        bw.align()
        out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_lossless_roundtrip_all_predictors():
    """Every predictor 1-7 reconstructs a full-range 8-bit image
    BIT-EXACTLY (lossless means lossless, not RMSE-bounded)."""
    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (13, 19))
    for pred in range(1, 8):
        payload = encode_jpeg_lossless([img], 19, 13, pred)
        w, h, planes = decode_jpeg(payload)
        assert (w, h) == (19, 13)
        assert np.array_equal(planes[0].astype(np.int64), img), f"pred {pred}"


def test_lossless_interleaved_color_restarts_and_per_component():
    """3-component 12-bit file: interleaved with restart markers AND the
    one-scan-per-component shape both reconstruct exactly (restarts reset
    prediction per H.2.2 — a decoder that keeps predicting across RSTn
    desyncs immediately on full-range data)."""
    rng = np.random.RandomState(7)
    comps = [rng.randint(0, 4096, (9, 11)) for _ in range(3)]
    with_rst = encode_jpeg_lossless(comps, 11, 9, 4, prec=12, dri=5)
    assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
    w, h, planes = decode_jpeg(with_rst)
    assert (w, h) == (11, 9)
    for got, src in zip(planes, comps):
        assert np.array_equal(got.astype(np.int64), src)
    per_comp = encode_jpeg_lossless(comps, 11, 9, 4, prec=12, per_component=True)
    for got, src in zip(decode_jpeg(per_comp)[2], comps):
        assert np.array_equal(got.astype(np.int64), src)


def test_lossless_16bit_and_point_transform():
    """prec=16 exercises the mod-2^16 difference arithmetic (diff 32768
    → the SSSS=16 no-magnitude-bits special case); Pt>0 output shifts
    left so the decode equals the original quantized to Pt bits."""
    rng = np.random.RandomState(3)
    img16 = rng.randint(0, 65536, (6, 7))
    payload = encode_jpeg_lossless([img16], 7, 6, 1, prec=16)
    assert np.array_equal(decode_jpeg(payload)[2][0].astype(np.int64), img16)
    img8 = rng.randint(0, 256, (8, 8))
    payload = encode_jpeg_lossless([img8 >> 2], 8, 8, 2, prec=8, pt=2)
    got = decode_jpeg(payload)[2][0].astype(np.int64)
    assert np.array_equal(got, (img8 >> 2) << 2)


def test_lossless_subsampled_interleaved_roundtrip():
    """4:2:0 interleaved lossless with odd frame dims and restarts:
    luma decodes 11x9, chroma ceil-scaled 6x5 (A.1.1); the MCU grid pads
    luma to 12x10 and the decoder crops back — every component
    reconstructs BIT-EXACTLY (was a NotImplementedError seam through
    round-5 session 3)."""
    rng = np.random.RandomState(19)
    y = rng.randint(0, 256, (9, 11))
    cb = rng.randint(0, 256, (5, 6))
    cr = rng.randint(0, 256, (5, 6))
    for pred in (1, 4, 7):
        payload = encode_jpeg_lossless(
            [y, cb, cr], 11, 9, pred, dri=3,
            sampling=[(2, 2), (1, 1), (1, 1)],
        )
        assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
        w, h, planes = decode_jpeg(payload)
        assert (w, h) == (11, 9)
        assert [p.shape for p in planes] == [(9, 11), (5, 6), (5, 6)]
        for got, src in zip(planes, (y, cb, cr)):
            assert np.array_equal(got.astype(np.int64), src), pred


def test_lossless_subsampled_per_component_scans():
    """One SOS per component over a 4:2:2-sampled 12-bit frame: each
    non-interleaved scan runs on its component's own unpadded xi x yi
    grid (A.2.2) regardless of frame sampling factors — bit-exact."""
    rng = np.random.RandomState(23)
    y = rng.randint(0, 4096, (7, 13))
    c1 = rng.randint(0, 4096, (7, 7))  # xi = ceil(13/2) = 7
    payload = encode_jpeg_lossless(
        [y, c1], 13, 7, 5, prec=12, per_component=True,
        sampling=[(2, 1), (1, 1)],
    )
    w, h, planes = decode_jpeg(payload)
    assert (w, h) == (13, 7)
    assert [p.shape for p in planes] == [(7, 13), (7, 7)]
    for got, src in zip(planes, (y, c1)):
        assert np.array_equal(got.astype(np.int64), src)


def test_extended_sequential_12bit():
    """SOF1 12-bit: level shift 2048, 16-bit DQT (Pq=1), values clamp to
    [0, 4095] — reconstruction within the quantization-error bound at
    12-bit scale. SOF0 (baseline) with precision 12 stays rejected
    (T.81 B.2.2 allows 12-bit only in extended/progressive frames)."""
    rng = np.random.RandomState(11)
    yy, xx = np.mgrid[0:16, 0:24]
    img = np.clip(
        1800 + 900 * np.sin(xx / 5.0) + 600 * np.cos(yy / 7.0)
        + rng.randint(-160, 161, (16, 24)),
        600, 3400,
    ).astype(np.float64)
    q = {0: np.full((8, 8), 300.0)}  # >255 forces the 16-bit DQT shape
    payload = encode_jpeg([img], 24, 16, [(1, 1)], [0], q, prec=12)
    assert payload[payload.index(b"\xff\xc1") + 4] == 12  # SOF1, P=12
    w, h, planes = decode_jpeg(payload)
    assert (w, h) == (24, 16)
    rmse = float(np.sqrt(np.mean((planes[0] - img) ** 2)))
    assert rmse <= 300.0 / 2 + 2.0, rmse
    # near-lossless at q=1: 12-bit values round-trip to DCT rounding noise
    exact = encode_jpeg([img], 24, 16, [(1, 1)], [0], {0: np.ones((8, 8))}, prec=12)
    assert float(np.max(np.abs(decode_jpeg(exact)[2][0] - img))) <= 2.0
    # baseline SOF0 must NOT accept 12-bit samples
    bad = bytearray(exact)
    bad[bad.index(b"\xff\xc1") + 1] = 0xC0
    with pytest.raises(NotImplementedError, match="precision 12"):
        decode_jpeg(bytes(bad))


def test_progressive_12bit_matches_sequential():
    """12-bit progressive (SOF2, P=12) decodes bit-identically to the
    extended-sequential encoding of the same quantized source — the
    annex-G path is precision-agnostic except level shift and clamp."""
    rng = np.random.RandomState(12)
    img = np.clip(
        2048.0 + rng.randint(-1400, 1401, (16, 16)), 0, 4095
    ).astype(np.float64)
    q = {0: np.full((8, 8), 5.0)}
    seq = encode_jpeg([img], 16, 16, [(1, 1)], [0], q, prec=12)
    prog = encode_jpeg_progressive([img], 16, 16, [(1, 1)], [0], q, prec=12)
    a = decode_jpeg(seq)[2][0]
    b = decode_jpeg(prog)[2][0]
    # identical integer coefficients; the only difference is FP summation
    # order (per-block matmul IDCT vs the progressive path's vectorized
    # einsum) — last-ulp at 12-bit magnitudes, so assert to 1e-9
    assert float(np.max(np.abs(a - b))) <= 1e-9
    assert float(a.max()) > 255.0  # actually exercised the 12-bit range


def test_high_precision_gray_contract_rescales():
    """Round-5 review regression: decode_jpeg_gray is the [0,255]
    gray-contract boundary — 12-bit SOF1 and 16-bit lossless frames
    rescale by 255/(2^P-1), while decode_jpeg itself stays in native
    range (bit-exact round-trips). 8-bit output is untouched (factor
    exactly 1)."""
    rng = np.random.RandomState(3)
    img12 = rng.randint(0, 4096, (16, 16)).astype(np.float64)
    p12 = encode_jpeg([img12], 16, 16, [(1, 1)], [0], {0: np.ones((8, 8))}, prec=12)
    w, h, native = decode_jpeg(p12)
    assert float(np.max(native[0])) > 255.0  # native stays 12-bit range
    gw, gh, gray = decode_jpeg_gray(p12)
    assert (gw, gh) == (w, h) == (16, 16)
    assert float(gray.max()) <= 255.0
    assert np.allclose(gray, native[0] * (255.0 / 4095.0))
    # with_precision exposes P on both frame kinds
    assert decode_jpeg(p12, with_precision=True)[3] == 12

    img16 = rng.randint(0, 65536, (8, 10)).astype(np.int64)
    p16 = encode_jpeg_lossless([img16], 10, 8, 1, prec=16)
    wl, hl, nat, prec = decode_jpeg(p16, with_precision=True)
    assert prec == 16 and np.array_equal(nat[0], img16)  # native bit-exact
    gl = decode_jpeg_gray(p16)[2]
    assert float(gl.max()) <= 255.0
    assert np.allclose(gl, img16 * (255.0 / 65535.0))

    img8 = rng.randint(0, 256, (8, 8)).astype(np.float64)
    p8 = encode_jpeg([img8], 8, 8, [(1, 1)], [0], {0: np.ones((8, 8))})
    assert np.array_equal(decode_jpeg_gray(p8)[2], decode_jpeg(p8)[2][0])


def test_lossless_restart_interval_predicts_per_spec():
    """Round-5 review regression (T.81 H.1.2.2): a restart interval
    restarts the prediction like a new scan — first sample predicts the
    default 2^(P-Pt-1) and the REST of the interval's first sample row
    predicts Ra (the 1-D predictor), even mid-image and even when the
    scan selects a 2-D predictor. The bitstream here is assembled from
    HAND-DERIVED diffs (spec wording transcribed by hand), so the
    decoder is pinned to the spec, not to the shared test encoder."""
    img = np.array([[10, 20, 30, 40], [50, 60, 70, 80]], dtype=np.int64)
    # predictor 4, dri=3 -> intervals [0..2], [3..5], [6..7]; per H.1.2.2:
    #   m0 default(128): 10-128=-118   m1 Ra(10): +10      m2 Ra(20): +10
    #   m3 default(128): 40-128=-88    m4 Rb(10): +40
    #   m5 pred4 ra+rb-rc = 50+20-10=60: +0
    #   m6 default(128): 70-128=-58    m7 Ra(70): +10  <- the old absolute
    #      (y,x) rule used pred4 = 70+40-30 = 80 here (diff 0) and desynced
    diffs = [[-118, 10, 10], [-88, 40, 0], [-58, 10]]
    toks = [(d & 0xFFFF) if (d & 0xFFFF) == 32768 else d for seg in diffs for d in seg]
    counts, syms, codes = _canonical([_cat(d) for d in toks])
    out = bytearray(b"\xff\xd8")

    def seg_m(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    seg_m(0xC3, bytes([8]) + (2).to_bytes(2, "big") + (4).to_bytes(2, "big")
          + bytes([1, 1, 0x11, 0]))
    seg_m(0xC4, bytes([0x00]) + bytes(counts) + bytes(syms))
    seg_m(0xDD, (3).to_bytes(2, "big"))
    seg_m(0xDA, bytes([1, 1, 0x00, 4, 0, 0]))  # Ss=4 (2-D predictor)
    for i, seg_d in enumerate(diffs):
        bw = _BitWriter()
        for d in seg_d:
            s = _cat(d)
            code, ln = codes[s]
            bw.write(code, ln)
            if s:
                bw.write(_mag(d, s), s)
        bw.align()
        out.extend(bw.out)
        if i < len(diffs) - 1:
            out.extend(bytes([0xFF, 0xD0 + i]))
    out.extend(b"\xff\xd9")
    w, h, planes = decode_jpeg(bytes(out))
    assert (w, h) == (4, 2)
    assert np.array_equal(planes[0].astype(np.int64), img)

    # and the shared encoder round-trips mid-row restarts for every
    # predictor (dri=3 is NOT row-aligned at w=5)
    rng = np.random.RandomState(7)
    big = rng.randint(0, 256, (4, 5))
    for pred in range(1, 8):
        payload = encode_jpeg_lossless([big], 5, 4, pred, dri=3)
        assert np.array_equal(
            decode_jpeg(payload)[2][0].astype(np.int64), big
        ), f"pred {pred}"


# ------------------------------------------------- arithmetic (SOF9)


class _QMEncoder:
    """Mirror-image of the package's ``_QMDecoder`` (T.81 annex D encode
    procedures: CODE with conditional MPS/LPS exchange over the Table
    D.3 state machine, RENORME, BYTEOUT with carry ripple into already-
    emitted bytes, CLEARBITS flush). Emits UN-stuffed bytes; callers
    apply 0xFF00 stuffing when assembling the scan."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.raw = []

    def encode(self, st, k, bit):
        sv = st[k]
        qe, nmps, nlps, switch = _QE[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if bit == mps:
            if a & 0x8000:
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the Qe-sized top
                self.c += a
                a = qe
            st[k] = (mps << 7) | nmps
        else:
            if a >= qe:  # LPS normally takes the Qe-sized top
                self.c += a
                a = qe
            if switch:
                mps ^= 1
            st[k] = (mps << 7) | nlps
        while True:  # RENORME
            a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if a & 0x8000:
                break
        self.a = a

    def _byteout(self):
        t = self.c >> 19
        if t > 0xFF:
            i = len(self.raw) - 1  # carry ripples into emitted bytes
            while True:
                assert i >= 0, "carry out of stream start"
                self.raw[i] += 1
                if self.raw[i] <= 0xFF:
                    break
                self.raw[i] = 0
                i -= 1
        self.raw.append(t & 0xFF)
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        # CLEARBITS: largest value in [C, C+A) with 16 trailing zero bits
        t = (self.c + self.a - 1) & ~0xFFFF
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        for _ in range(3):  # decoder primes 3 bytes and zero-feeds after
            self._byteout()
            self.c <<= 8
        return bytes(self.raw)


def _stuff(raw: bytes) -> bytes:
    out = bytearray()
    for b in raw:
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


def _encode_mag(enc, st, base, m0, n):
    """Mirror of jpeg._arith_decode_mag for value n >= m0: X-chain
    widening decisions then the low magnitude bits, MSB first. Returns
    the category m (for DC conditioning classification)."""
    m = 1 << (n.bit_length() - 1)
    k, mm = base, m0
    while mm < m:
        enc.encode(st, k, 1)
        mm <<= 1
        k += 1
    enc.encode(st, k, 0)
    k += 14
    bit = m >> 1
    while bit:
        enc.encode(st, k, 1 if n & bit else 0)
        bit >>= 1
    return m


def _enc_dc_diff(enc, dst, ctx, u_dc, l_dc, diff):
    """Mirror of jpeg._arith_dc_diff: encode one DC difference through
    the F.2.2.1 tree at context ``ctx``; returns the next context."""
    if diff == 0:
        enc.encode(dst, ctx, 0)
        return 0
    enc.encode(dst, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(dst, ctx + 1, sign)
    n = abs(diff) - 1
    if n == 0:
        enc.encode(dst, ctx + 2 + sign, 0)
        m = 0
    else:
        enc.encode(dst, ctx + 2 + sign, 1)
        m = _encode_mag(enc, dst, 20, 1, n)
    if m < (1 << l_dc) >> 1:
        return 0
    if m > (1 << u_dc) >> 1:
        return 12 + sign * 4
    return 4 + sign * 4


def _enc_ac_value(enc, ast, fixed, b, k, kx, val):
    """Mirror of jpeg._arith_ac_value: sign through the fixed state,
    the two low-magnitude decisions at bin b+2, then the Kx-split
    X/M chains."""
    enc.encode(fixed, 0, 1 if val < 0 else 0)
    n = abs(val) - 1
    if n == 0:
        enc.encode(ast, b + 2, 0)
    elif n == 1:
        enc.encode(ast, b + 2, 1)
        enc.encode(ast, b + 2, 0)
    else:
        enc.encode(ast, b + 2, 1)
        enc.encode(ast, b + 2, 1)
        _encode_mag(enc, ast, 189 if k <= kx else 217, 2, n)


def _encode_arith_scan(
    qblocks, comp_list, factors, w, h, mcus_x, mcus_y, dri, tid, dcc, acc
):
    if len(comp_list) > 1:
        gx, gy = mcus_x, mcus_y
        units = [(i,) + tuple(factors[i]) for i in comp_list]
    else:
        i0 = comp_list[0]
        gy, gx = _comp_grid(i0, w, h, factors)
        units = [(i0, 1, 1)]

    out = bytearray()
    rst = 0

    def fresh():
        return (
            _QMEncoder(),
            {tid(i): bytearray(64) for i in comp_list},
            {tid(i): bytearray(256) for i in comp_list},
            bytearray([113]),
            {i: 0 for i in comp_list},
            {i: 0 for i in comp_list},
        )

    enc, dstats, astats, fixed, ctxs, preds = fresh()
    for mi in range(gx * gy):
        if dri and mi and mi % dri == 0:
            out.extend(_stuff(enc.flush()))
            out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            enc, dstats, astats, fixed, ctxs, preds = fresh()
        my, mx = divmod(mi, gx)
        for i, hu, vu in units:
            dst, ast = dstats[tid(i)], astats[tid(i)]
            u_dc, l_dc = dcc.get(tid(i), (1, 0))
            kx = acc.get(tid(i), 5)
            for v in range(vu):
                for hh in range(hu):
                    zz = qblocks[i][my * vu + v, mx * hu + hh]
                    dc = int(zz[0])
                    diff = dc - preds[i]
                    preds[i] = dc
                    ctx = ctxs[i]
                    if diff == 0:
                        enc.encode(dst, ctx, 0)
                        ctxs[i] = 0
                    else:
                        enc.encode(dst, ctx, 1)
                        sign = 1 if diff < 0 else 0
                        enc.encode(dst, ctx + 1, sign)
                        n = abs(diff) - 1
                        if n == 0:
                            enc.encode(dst, ctx + 2 + sign, 0)
                            m = 0
                        else:
                            enc.encode(dst, ctx + 2 + sign, 1)
                            m = _encode_mag(enc, dst, 20, 1, n)
                        if m < (1 << l_dc) >> 1:
                            ctxs[i] = 0
                        elif m > (1 << u_dc) >> 1:
                            ctxs[i] = 12 + sign * 4
                        else:
                            ctxs[i] = 4 + sign * 4
                    nz = np.nonzero(zz[1:])[0]
                    eob = (int(nz[-1]) + 2) if len(nz) else 1
                    k = 1
                    while k <= 63:
                        b = 3 * (k - 1)
                        if k >= eob:
                            enc.encode(ast, b, 1)  # EOB
                            break
                        enc.encode(ast, b, 0)
                        while int(zz[k]) == 0:
                            enc.encode(ast, b + 1, 0)
                            k += 1
                            b = 3 * (k - 1)
                        enc.encode(ast, b + 1, 1)
                        val = int(zz[k])
                        sign = 1 if val < 0 else 0
                        enc.encode(fixed, 0, sign)
                        n = abs(val) - 1
                        if n == 0:
                            enc.encode(ast, b + 2, 0)
                        elif n == 1:
                            enc.encode(ast, b + 2, 1)
                            enc.encode(ast, b + 2, 0)
                        else:
                            enc.encode(ast, b + 2, 1)
                            enc.encode(ast, b + 2, 1)
                            _encode_mag(enc, ast, 189 if k <= kx else 217, 2, n)
                        k += 1
    out.extend(_stuff(enc.flush()))
    return bytes(out)


def encode_jpeg_arith(
    planes, w, h, factors, qt_of, qtabs, prec=8, dri=0,
    per_component=False, conditioning=None,
):
    """Sequential ARITHMETIC (SOF9) encoder: the same DCT/quant front
    end as ``encode_jpeg``, with the F.2.2 decision trees driven through
    ``_QMEncoder`` instead of Huffman tokens. Component 0 uses
    conditioning tables 0, the rest table 1. ``conditioning``:
    {"dc": {tid: (U, L)}, "ac": {tid: Kx}} emitted as a DAC segment."""
    nc = len(planes)
    qblocks, mcus_x, mcus_y = _quantize_blocks(
        planes, w, h, factors, qt_of, qtabs, prec
    )
    cond = conditioning or {}
    dcc, acc = cond.get("dc", {}), cond.get("ac", {})

    def tid(i):
        return 0 if i == 0 else 1

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    for t, q in qtabs.items():
        qz = q.reshape(64)[ZIGZAG].astype(int)
        if int(qz.max()) > 255:
            seg(0xDB, bytes([0x10 | t]) + b"".join(int(x).to_bytes(2, "big") for x in qz))
        else:
            seg(0xDB, bytes([t]) + bytes(int(x) for x in qz))
    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (factors[i][0] << 4) | factors[i][1], qt_of[i]])
    seg(0xC9, sof)
    if dcc or acc:
        body = b""
        for t, (u, low) in sorted(dcc.items()):
            body += bytes([t, (u << 4) | low])
        for t, kx in sorted(acc.items()):
            body += bytes([0x10 | t, kx])
        seg(0xCC, body)
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    scans = [[i] for i in range(nc)] if per_component else [list(range(nc))]
    for comp_list in scans:
        sos = bytes([len(comp_list)])
        for i in comp_list:
            sos += bytes([i + 1, (tid(i) << 4) | tid(i)])
        sos += bytes([0, 63, 0])
        seg(0xDA, sos)
        out.extend(
            _encode_arith_scan(
                qblocks, comp_list, factors, w, h, mcus_x, mcus_y, dri,
                tid, dcc, acc,
            )
        )
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_arith_gray_equals_huffman_twin():
    """The SOF9 decode of an image must be BIT-IDENTICAL to the SOF0
    decode of its Huffman twin (same planes, same quant tables): the two
    entropy coders carry the same quantized coefficients, so any decoder
    drift shows up as a plane mismatch — a cross-check between two
    independent wire formats, not just a self-round-trip."""
    img = _img(24, 31, seed=5)
    q = {0: np.ones((8, 8))}
    ar = encode_jpeg_arith([img], 31, 24, [(1, 1)], [0], q)
    hu = encode_jpeg([img], 31, 24, [(1, 1)], [0], q)
    wa, ha, pa = decode_jpeg(ar)
    wh, hh, ph = decode_jpeg(hu)
    assert (wa, ha) == (wh, hh) == (31, 24)
    assert np.array_equal(pa[0], ph[0])


def test_arith_color_420_restarts_equals_huffman():
    """3-component 4:2:0 with restart markers: every plane identical to
    the Huffman twin's (restarts re-initialize the QM coder, ALL
    statistics areas, DC contexts and predictions per E.2.4 — a decoder
    that carries any of them across RSTn desyncs immediately)."""
    y, cb, cr = _img(21, 37, 1), _img(11, 19, 2), _img(11, 19, 3)
    factors = [(2, 2), (1, 1), (1, 1)]
    q = {0: np.full((8, 8), 3.0), 1: np.full((8, 8), 5.0)}
    ar = encode_jpeg_arith([y, cb, cr], 37, 21, factors, [0, 1, 1], q, dri=2)
    assert b"\xff\xd0" in ar or b"\xff\xd1" in ar
    hu = encode_jpeg([y, cb, cr], 37, 21, factors, [0, 1, 1], q, dri=2)
    pa = decode_jpeg(ar)[2]
    ph = decode_jpeg(hu)[2]
    for a, b in zip(pa, ph):
        assert a.shape == b.shape
        assert np.array_equal(a, b)


def test_arith_12bit_with_dac_conditioning():
    """12-bit SOF9 with a DAC segment selecting non-default conditioning
    (DC U=3/L=1, AC Kx=9) round-trips against the Huffman twin — the
    conditioning changes the context classification and the AC X-chain
    split, so a decoder ignoring DAC desyncs its statistics."""
    rng = np.random.RandomState(17)
    yy, xx = np.mgrid[0:16, 0:24]
    img = np.clip(
        1800 + 900 * np.sin(xx / 5.0) + 600 * np.cos(yy / 7.0)
        + rng.randint(-160, 161, (16, 24)),
        600, 3400,
    ).astype(np.float64)
    q = {0: np.full((8, 8), 4.0)}
    cond = {"dc": {0: (3, 1)}, "ac": {0: 9}}
    ar = encode_jpeg_arith(
        [img], 24, 16, [(1, 1)], [0], q, prec=12, conditioning=cond
    )
    assert b"\xff\xcc" in ar  # DAC present
    hu = encode_jpeg([img], 24, 16, [(1, 1)], [0], q, prec=12)
    assert np.array_equal(decode_jpeg(ar)[2][0], decode_jpeg(hu)[2][0])


def test_arith_per_component_scans():
    """One SOS per component (non-interleaved SOF9): each scan gets its
    own QM coder lifetime; planes equal the interleaved arithmetic
    encode's."""
    y, cb = _img(13, 17, 4), _img(13, 17, 9)
    q = {0: np.full((8, 8), 2.0), 1: np.full((8, 8), 2.0)}
    pc = encode_jpeg_arith(
        [y, cb], 17, 13, [(1, 1), (1, 1)], [0, 1], q, per_component=True
    )
    il = encode_jpeg_arith([y, cb], 17, 13, [(1, 1), (1, 1)], [0, 1], q)
    pp = decode_jpeg(pc)[2]
    pi = decode_jpeg(il)[2]
    for a, b in zip(pp, pi):
        assert np.array_equal(a, b)


def test_arith_compresses_high_entropy_legally():
    """Full-range noise (worst case for the adaptive states) still
    round-trips, and rewriting the SOF to the lossless-arithmetic
    marker makes a MALFORMED file (its sequential scan header is no
    legal predictor) — rejected loudly, never mis-decoded."""
    rng = np.random.RandomState(99)
    img = rng.randint(0, 256, (16, 16)).astype(np.float64)
    q = {0: np.ones((8, 8))}
    ar = encode_jpeg_arith([img], 16, 16, [(1, 1)], [0], q)
    hu = encode_jpeg([img], 16, 16, [(1, 1)], [0], q)
    assert np.array_equal(decode_jpeg(ar)[2][0], decode_jpeg(hu)[2][0])
    bad = bytearray(ar)
    bad[bad.index(b"\xff\xc9") + 1] = 0xCB  # SOF11: lossless arithmetic
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(bad))


# ------------------------------------------- progressive arithmetic (SOF10)


def _enc_arith_prog_scan(
    qblocks, comps, factors, w, h, mcus_x, mcus_y, dri, tid, dcc, acc,
    ss, se, ah, al,
):
    """Encode ONE progressive arithmetic scan, mirroring the decoder's
    annex-G decision order exactly (per-block adaptive EOB decisions in
    place of Huffman EOB run-lengths; correction bits through the ast /
    fixed states in the positions the decoder reads them)."""
    out = bytearray()
    rst = [0]

    def restart(enc):
        out.extend(_stuff(enc.flush()))
        out.extend(bytes([0xFF, 0xD0 + (rst[0] % 8)]))
        rst[0] += 1

    if ss == 0:  # DC scan: MCU order (interleaved) or component grid
        if len(comps) > 1:
            gx, gy = mcus_x, mcus_y
            units = [(i,) + tuple(factors[i]) for i in comps]
        else:
            gy, gx = _comp_grid(comps[0], w, h, factors)
            units = [(comps[0], 1, 1)]

        def fresh():
            return (
                _QMEncoder(),
                {tid(i): bytearray(64) for i in comps},
                bytearray([113]),
                {i: 0 for i in comps},
                {i: 0 for i in comps},
            )

        enc, dstats, fixed, ctxs, preds = fresh()
        for mi in range(gx * gy):
            if dri and mi and mi % dri == 0:
                restart(enc)
                enc, dstats, fixed, ctxs, preds = fresh()
            my, mx = divmod(mi, gx)
            for i, hu, vu in units:
                u_dc, l_dc = dcc.get(tid(i), (1, 0))
                for v in range(vu):
                    for hh in range(hu):
                        dc = int(qblocks[i][my * vu + v, mx * hu + hh, 0])
                        if ah == 0:
                            shifted = dc >> al  # arithmetic shift (G.1.2.1)
                            ctxs[i] = _enc_dc_diff(
                                enc, dstats[tid(i)], ctxs[i], u_dc, l_dc,
                                shifted - preds[i],
                            )
                            preds[i] = shifted
                        else:  # refinement: bit Al through the fixed state
                            enc.encode(fixed, 0, (dc >> al) & 1)
        out.extend(_stuff(enc.flush()))
        return bytes(out)

    # AC scan: single component, block-raster over its grid
    i0 = comps[0]
    kx = acc.get(tid(i0), 5)
    bys, bxs = _comp_grid(i0, w, h, factors)
    qb = qblocks[i0]

    def fresh_ac():
        return _QMEncoder(), bytearray(256), bytearray([113])

    enc, ast, fixed = fresh_ac()
    for bi in range(bys * bxs):
        if dri and bi and bi % dri == 0:
            restart(enc)
            enc, ast, fixed = fresh_ac()
        by, bx = divmod(bi, bxs)
        v = [int(x) for x in qb[by, bx]]
        if ah == 0:  # AC first: magnitude-truncated values (G.1.2.2)
            red = {
                k: (1 if v[k] > 0 else -1) * (abs(v[k]) >> al)
                for k in range(ss, se + 1)
            }
            klast = max((k for k in range(ss, se + 1) if red[k]), default=ss - 1)
            k = ss
            while k <= se:
                b = 3 * (k - 1)
                if k > klast:
                    enc.encode(ast, b, 1)  # EOB
                    break
                enc.encode(ast, b, 0)
                while red[k] == 0:
                    enc.encode(ast, b + 1, 0)
                    k += 1
                    b = 3 * (k - 1)
                enc.encode(ast, b + 1, 1)
                _enc_ac_value(enc, ast, fixed, b, k, kx, red[k])
                k += 1
        else:  # AC refinement
            prev = {k: abs(v[k]) >> (al + 1) for k in range(ss, se + 1)}
            cur = {k: abs(v[k]) >> al for k in range(ss, se + 1)}
            kex = max((k for k in range(ss, se + 1) if prev[k]), default=0)
            klast = max((k for k in range(ss, se + 1) if cur[k]), default=ss - 1)
            k = ss
            while k <= se:
                b = 3 * (k - 1)
                if k > kex:
                    eob = 1 if k > klast else 0
                    enc.encode(ast, b, eob)
                    if eob:
                        break
                while True:
                    if prev[k]:
                        enc.encode(ast, b + 2, cur[k] & 1)
                        break
                    if cur[k]:  # newly nonzero: always magnitude 1
                        enc.encode(ast, b + 1, 1)
                        enc.encode(fixed, 0, 1 if v[k] < 0 else 0)
                        break
                    enc.encode(ast, b + 1, 0)
                    k += 1
                    b = 3 * (k - 1)
                k += 1
    out.extend(_stuff(enc.flush()))
    return bytes(out)


def encode_jpeg_arith_prog(
    planes, w, h, factors, qt_of, qtabs, script=None, prec=8, dri=0,
    conditioning=None,
):
    """Progressive ARITHMETIC (SOF10) encoder: the spectral-selection /
    successive-approximation scan scripts of ``encode_jpeg_progressive``
    driven through the QM coder instead of per-scan Huffman tables."""
    nc = len(planes)
    qblocks, mcus_x, mcus_y = _quantize_blocks(
        planes, w, h, factors, qt_of, qtabs, prec
    )
    cond = conditioning or {}
    dcc, acc = cond.get("dc", {}), cond.get("ac", {})
    if script is None:
        if nc == 1:
            script = [
                ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
            ]
        else:
            script = [
                (list(range(nc)), 0, 0, 0, 1),
                ([0], 1, 5, 0, 2), ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                (list(range(nc)), 0, 0, 1, 0),
                ([2], 1, 63, 1, 0), ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
            ]

    def tid(i):
        return 0 if i == 0 else 1

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    for t, q in qtabs.items():
        qz = q.reshape(64)[ZIGZAG].astype(int)
        if int(qz.max()) > 255:
            seg(0xDB, bytes([0x10 | t]) + b"".join(int(x).to_bytes(2, "big") for x in qz))
        else:
            seg(0xDB, bytes([t]) + bytes(int(x) for x in qz))
    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        sof += bytes([i + 1, (factors[i][0] << 4) | factors[i][1], qt_of[i]])
    seg(0xCA, sof)
    if dcc or acc:
        body = b""
        for t, (u, low) in sorted(dcc.items()):
            body += bytes([t, (u << 4) | low])
        for t, k in sorted(acc.items()):
            body += bytes([0x10 | t, k])
        seg(0xCC, body)
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    for comps, sss, sse, ah, al in script:
        sos = bytes([len(comps)])
        for i in comps:
            sos += bytes([i + 1, (tid(i) << 4) | tid(i)])
        sos += bytes([sss, sse, (ah << 4) | al])
        seg(0xDA, sos)
        out.extend(
            _enc_arith_prog_scan(
                qblocks, comps, factors, w, h, mcus_x, mcus_y, dri,
                tid, dcc, acc, sss, sse, ah, al,
            )
        )
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_arith_progressive_color_420_equals_sequential():
    """SOF10 with the full default script (spectral selection + DC and
    AC successive approximation) over a 4:2:0 image decodes to EXACTLY
    the sequential-arithmetic (and hence Huffman) planes."""
    y = _img(24, 36, 20)
    cb, cr = _img(12, 18, 21), _img(12, 18, 22)
    q = {0: np.full((8, 8), 4.0), 1: np.full((8, 8), 6.0)}
    factors = [(2, 2), (1, 1), (1, 1)]
    prog = encode_jpeg_arith_prog([y, cb, cr], 36, 24, factors, [0, 1, 1], q)
    seqb = encode_jpeg_arith([y, cb, cr], 36, 24, factors, [0, 1, 1], q)
    wp, hp, pp = decode_jpeg(prog)
    ws, hs, ps = decode_jpeg(seqb)
    assert (wp, hp) == (ws, hs) == (36, 24)
    for a, b in zip(pp, ps):
        # identical coefficients; dequant/IDCT float op order differs
        # between the per-MCU sequential path and the coef-array path
        assert float(np.max(np.abs(a - b))) <= 1e-9


def test_arith_progressive_restarts_and_conditioning():
    """Restart intervals (QM + statistics + DC state reset per interval)
    and DAC conditioning change the bytes but not the decode."""
    img = _img(25, 19, 23)  # odd dims: pad + crop
    q = {0: np.full((8, 8), 3.0)}
    cond = {"dc": {0: (2, 1)}, "ac": {0: 9}}
    base = encode_jpeg_arith_prog([img], 19, 25, [(1, 1)], [0], q)
    wired = encode_jpeg_arith_prog(
        [img], 19, 25, [(1, 1)], [0], q, dri=2, conditioning=cond
    )
    assert base != wired
    assert np.array_equal(decode_jpeg(base)[2][0], decode_jpeg(wired)[2][0])


def test_arith_progressive_noninterleaved_dc_subsampled():
    """Per-component DC scans (legal alternative to the interleaved DC
    scan) walk each component's own grid, including a subsampled one."""
    y = _img(16, 24, 24)
    cb = _img(8, 12, 25)
    q = {0: np.full((8, 8), 2.0), 1: np.full((8, 8), 2.0)}
    factors = [(2, 2), (1, 1)]
    script = [
        ([0], 0, 0, 0, 1), ([1], 0, 0, 0, 1),
        ([0], 1, 63, 0, 0), ([1], 1, 63, 0, 0),
        ([0], 0, 0, 1, 0), ([1], 0, 0, 1, 0),
    ]
    prog = encode_jpeg_arith_prog([y, cb], 24, 16, factors, [0, 1], q, script)
    seqb = encode_jpeg_arith([y, cb], 24, 16, factors, [0, 1], q)
    for a, b in zip(decode_jpeg(prog)[2], decode_jpeg(seqb)[2]):
        assert float(np.max(np.abs(a - b))) <= 1e-9


def test_arith_progressive_12bit_matches_sequential():
    """12-bit progressive arithmetic (legal per T.81 B.2.2) with a
    16-bit quantization table round-trips against extended sequential."""
    rng = np.random.RandomState(26)
    img = rng.randint(0, 4096, (16, 16)).astype(np.float64)
    q = {0: np.full((8, 8), 300.0)}
    prog = encode_jpeg_arith_prog([img], 16, 16, [(1, 1)], [0], q, prec=12)
    seqb = encode_jpeg_arith([img], 16, 16, [(1, 1)], [0], q, prec=12)
    (wp, hp, pp), (ws, hs, ps) = decode_jpeg(prog), decode_jpeg(seqb)
    assert float(np.max(np.abs(pp[0] - ps[0]))) <= 1e-9
    _, _, _, prec = decode_jpeg(prog, with_precision=True)
    assert prec == 12


# --------------------------------------------- lossless arithmetic (SOF11)


def _lossless_q_mirror(diff, u, low):
    """Mirror of jpeg._lossless_q: 5-way Da/Db classification."""
    if diff == 0:
        return 0
    v = abs(diff)
    m = 0 if v == 1 else 1 << ((v - 1).bit_length() - 1)
    if m < (1 << low) >> 1:
        return 0
    sign = 1 if diff < 0 else 0
    if m > (1 << u) >> 1:
        return 3 + sign
    return 1 + sign


def _enc_lossless_diff(enc, st, ctx, chain, d):
    """Mirror of jpeg._arith_lossless_diff: one signed difference
    through the zero / sign / magnitude>1 / X-M tree."""
    if d == 0:
        enc.encode(st, ctx, 0)
        return
    enc.encode(st, ctx, 1)
    sign = 1 if d < 0 else 0
    enc.encode(st, ctx + 1, sign)
    n = abs(d) - 1
    if n == 0:
        enc.encode(st, ctx + 2 + sign, 0)
    else:
        enc.encode(st, ctx + 2 + sign, 1)
        _encode_mag(enc, st, chain, 1, n)


def encode_jpeg_lossless_arith(
    planes, w, h, predictor, prec=8, pt=0, dri=0, per_component=False,
    sampling=None, conditioning=None,
):
    """Lossless ARITHMETIC (SOF11) encoder: the predictor DPCM front end
    of ``encode_jpeg_lossless`` with differences coded through the QM
    coder under the H.1.2.3 two-dimensional conditioning (context =
    4·(5·Q(Da)+Q(Db)), dual X/M chains at 100/129 selected by Q(Db),
    158-bin area). One conditioning table id 0 for every component;
    ``conditioning`` = (U, L) emits a DAC segment."""
    nc = len(planes)
    sampling = sampling or [(1, 1)] * nc
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux, mcuy = -(-w // hmax), -(-h // vmax)
    dims, padded = [], []
    for p, (hi, vi) in zip(planes, sampling):
        xi, yi = -(-(w * hi) // hmax), -(-(h * vi) // vmax)
        arr = np.asarray(p, dtype=np.int64)
        assert arr.shape == (yi, xi), (arr.shape, (yi, xi))
        dims.append((xi, yi))
        padded.append(
            np.pad(arr, ((0, mcuy * vi - yi), (0, mcux * hi - xi)), "edge")
        )
    default = 1 << (prec - pt - 1)
    u_dc, l_dc = conditioning if conditioning else (1, 0)

    def scan_bytes(order):
        if len(order) == 1:
            ci = order[0]
            xi, yi = dims[ci]
            units = [[(ci, m // xi, m % xi, True)] for m in range(xi * yi)]
        else:
            units = []
            for m in range(mcux * mcuy):
                mr, mc = divmod(m, mcux)
                unit = []
                for ci in order:
                    hi, vi = sampling[ci]
                    for v in range(vi):
                        for hh in range(hi):
                            unit.append(
                                (ci, mr * vi + v, mc * hi + hh,
                                 v == 0 and hh == 0)
                            )
                units.append(unit)
        out = bytearray()
        rst = 0
        enc, st = _QMEncoder(), bytearray(158)
        cls = {ci: np.zeros(padded[ci].shape, dtype=np.int8) for ci in order}
        seg_start, first_row = 0, {}
        for m, unit in enumerate(units):
            if dri and m and m % dri == 0:
                out.extend(_stuff(enc.flush()))
                out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
                rst += 1
                enc, st = _QMEncoder(), bytearray(158)
                for cl in cls.values():
                    cl[:] = 0
                seg_start = m
            if m == seg_start:
                first_row = {s[0]: s[1] for s in unit if s[3]}
            for ci, r, c, first in unit:
                p = padded[ci]
                if predictor == 0:  # differential frame: no prediction
                    px = 0
                elif m == seg_start and first:
                    px = default
                elif r == first_row[ci]:
                    px = int(p[r, c - 1])
                elif c == 0:
                    px = int(p[r - 1, c])
                else:
                    ra, rb = int(p[r, c - 1]), int(p[r - 1, c])
                    rc = int(p[r - 1, c - 1])
                    px = {
                        1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1), 6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1,
                    }[predictor]
                d = (int(p[r, c]) - px) & 0xFFFF
                if d > 32768:
                    d -= 65536
                qa = int(cls[ci][r, c - 1]) if c > 0 else 0
                qb = int(cls[ci][r - 1, c]) if r > 0 else 0
                _enc_lossless_diff(
                    enc, st, 4 * (5 * qa + qb), 100 if qb < 3 else 129, d
                )
                cls[ci][r, c] = _lossless_q_mirror(d, u_dc, l_dc)
        out.extend(_stuff(enc.flush()))
        return bytes(out)

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body)

    sof = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for i in range(nc):
        hi, vi = sampling[i]
        sof += bytes([i + 1, (hi << 4) | vi, 0])
    seg(0xCB, sof)
    if conditioning:
        seg(0xCC, bytes([0, (u_dc << 4) | l_dc]))
    if dri:
        seg(0xDD, dri.to_bytes(2, "big"))
    orders = [[ci] for ci in range(nc)] if per_component else [list(range(nc))]
    for order in orders:
        sos = bytes([len(order)])
        for ci in order:
            sos += bytes([ci + 1, 0x00])  # Td=0 conditioning table
        sos += bytes([predictor, 0, pt])  # Ss=predictor, Se=0, AhAl=Pt
        seg(0xDA, sos)
        out.extend(scan_bytes(order))
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_lossless_arith_roundtrip_all_predictors():
    """Every predictor 1-7 reconstructs a full-range 8-bit image
    BIT-EXACTLY through the SOF11 path, and the QM-coded file is
    smaller than the raw samples on natural-image-ish data."""
    rng = np.random.RandomState(30)
    base = np.cumsum(rng.randint(-6, 7, (16, 22)), axis=1).astype(np.int64)
    img = np.clip(base + 128, 0, 255)
    for pred in range(1, 8):
        pay = encode_jpeg_lossless_arith([img], 22, 16, pred)
        ww, hh, pl = decode_jpeg(pay)
        assert (ww, hh) == (22, 16)
        assert np.array_equal(pl[0], img), f"predictor {pred}"


def test_lossless_arith_color_restarts_and_conditioning():
    """Interleaved 3-component scan with restart intervals (QM + stats +
    conditioning-history reset) and a non-default DAC table; also the
    per-component-scan form of the same image."""
    rng = np.random.RandomState(31)
    pls = [rng.randint(0, 256, (9, 13)).astype(np.int64) for _ in range(3)]
    base = encode_jpeg_lossless_arith(pls, 13, 9, 4)
    wired = encode_jpeg_lossless_arith(
        pls, 13, 9, 4, dri=5, conditioning=(2, 1)
    )
    percomp = encode_jpeg_lossless_arith(pls, 13, 9, 4, per_component=True)
    assert base != wired
    for pay in (base, wired, percomp):
        _, _, pl = decode_jpeg(pay)
        for a, b in zip(pl, pls):
            assert np.array_equal(a, b)


def test_lossless_arith_16bit_point_transform_and_subsampled():
    """16-bit samples with Pt=2 (decoder re-shifts: output = coded << Pt)
    and a 4:2:0-subsampled interleaved scan both survive the SOF11 path;
    16-bit exercises the mod-2^16 wrap and the deepest X/M chains."""
    rng = np.random.RandomState(32)
    img16 = rng.randint(0, 1 << 14, (8, 10)).astype(np.int64)
    pay = encode_jpeg_lossless_arith([img16], 10, 8, 1, prec=16, pt=2)
    _, _, pl = decode_jpeg(pay)
    assert np.array_equal(pl[0], img16 << 2)

    y = rng.randint(0, 256, (10, 14)).astype(np.int64)
    cb = rng.randint(0, 256, (5, 7)).astype(np.int64)
    pay = encode_jpeg_lossless_arith(
        [y, cb], 14, 10, 7, sampling=[(2, 2), (1, 1)], dri=3
    )
    _, _, pl = decode_jpeg(pay)
    assert np.array_equal(pl[0], y)
    assert np.array_equal(pl[1], cb)


def test_lossless_arith_matches_huffman_twin():
    """The SOF11 decode equals the SOF3 decode of the same samples and
    predictor — two wire formats, one reconstruction."""
    rng = np.random.RandomState(33)
    img = rng.randint(0, 4096, (11, 9)).astype(np.int64)
    ar = encode_jpeg_lossless_arith([img], 9, 11, 5, prec=12)
    hu = encode_jpeg_lossless([img], 9, 11, 5, prec=12)
    assert np.array_equal(decode_jpeg(ar)[2][0], decode_jpeg(hu)[2][0])


# ------------------------------------------------- hierarchical (annex J)


def _exp_up_mirror(a, eh, ev):
    """Mirror of jpeg._exp_upsample (J.1.1.2)."""
    a = np.asarray(a, dtype=np.int64)
    if eh:
        out = np.empty((a.shape[0], a.shape[1] * 2), dtype=np.int64)
        out[:, 0::2] = a
        out[:, 1:-1:2] = (a[:, :-1] + a[:, 1:] + 1) >> 1
        out[:, -1] = a[:, -1]
        a = out
    if ev:
        out = np.empty((a.shape[0] * 2, a.shape[1]), dtype=np.int64)
        out[0::2, :] = a
        out[1:-1:2, :] = (a[:-1, :] + a[1:, :] + 1) >> 1
        out[-1, :] = a[-1, :]
        a = out
    return a


def _hier_stream(prec, h, w, sampling, frames):
    """Assemble a hierarchical JPEG: SOI + DHP + per-frame segments
    spliced from standalone encodes. ``frames``: list of
    (payload, differential) — each payload a complete single-frame JPEG
    whose SOI/EOI are stripped; a differential frame's SOF marker is
    rewritten to its differential twin (+5 Huffman, +4 arithmetic)."""
    out = bytearray(b"\xff\xd8")
    dhp = bytes([prec]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    dhp += bytes([len(sampling)])
    for i, (hi, vi) in enumerate(sampling):
        dhp += bytes([i + 1, (hi << 4) | vi, 0])
    out.extend(b"\xff\xde" + (len(dhp) + 2).to_bytes(2, "big") + dhp)
    for payload, differential, exp in frames:
        if exp:
            eh, ev = exp
            out.extend(b"\xff\xdf\x00\x03" + bytes([(eh << 4) | ev]))
        body = bytearray(payload[2:-2])  # strip SOI/EOI
        if differential:
            for base in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
                j = bytes(body).find(bytes([0xFF, base]))
                if j >= 0:
                    # SOF0/1→SOF5, SOF2→6, SOF3→7; SOF9/10/11→SOF13/14/15
                    body[j + 1] = base + (5 if base == 0xC0 else 4)
                    break
            else:
                raise AssertionError("no SOF marker found to differentiate")
        out.extend(body)
    out.extend(b"\xff\xd9")
    return bytes(out)


def test_hierarchical_lossless_pyramid_bit_exact():
    """Two-level lossless pyramid: SOF3 at half resolution, EXP, SOF7
    differential correction — the hierarchical decode equals the source
    BIT-EXACTLY (the classic 'lossless final frame' use of annex J)."""
    rng = np.random.RandomState(40)
    src = rng.randint(0, 256, (14, 17)).astype(np.int64)
    low = src[::2, ::2]  # encoder's choice of downsample filter
    lvl0 = encode_jpeg_lossless([low], low.shape[1], low.shape[0], 4)
    ref = _exp_up_mirror(low, 1, 1)[: src.shape[0], : src.shape[1]]
    diff = (src - ref) & 0xFFFF
    lvl1 = encode_jpeg_lossless([diff], 17, 14, 0)  # predictor 0: no pred
    pay = _hier_stream(
        8, 14, 17, [(1, 1)],
        [(lvl0, False, None), (lvl1, True, (1, 1))],
    )
    ww, hh, pl = decode_jpeg(pay)
    assert (ww, hh) == (17, 14)
    assert np.array_equal(pl[0], src)


def test_hierarchical_arith_lossless_differential():
    """Arithmetic pyramid: SOF11 base + SOF15 differential correction
    (conditioning classifies the coded differences) — bit-exact, and
    restart intervals inside the differential frame survive."""
    rng = np.random.RandomState(41)
    src = rng.randint(0, 4096, (9, 12)).astype(np.int64)
    low = src[::2, ::2]
    lvl0 = encode_jpeg_lossless_arith(
        [low], low.shape[1], low.shape[0], 1, prec=12
    )
    ref = _exp_up_mirror(low, 1, 1)[:9, :12]
    diff = (src - ref) & 0xFFFF
    lvl1 = encode_jpeg_lossless_arith([diff], 12, 9, 0, prec=12, dri=7)
    pay = _hier_stream(
        12, 9, 12, [(1, 1)],
        [(lvl0, False, None), (lvl1, True, (1, 1))],
    )
    _, _, pl = decode_jpeg(pay)
    assert np.array_equal(pl[0], src)


def test_hierarchical_dct_refinement():
    """DCT hierarchical: a coarsely-quantized SOF0 frame refined by a
    same-size SOF5 differential frame at q=1 — the final image is
    within the fine quantizer's error of the source, far better than
    the coarse frame alone."""
    img = _img(16, 16, 42)
    qc = {0: np.full((8, 8), 32.0)}
    qf = {0: np.ones((8, 8))}
    lvl0 = encode_jpeg([img], 16, 16, [(1, 1)], [0], qc)
    ref = np.clip(np.floor(decode_jpeg(lvl0)[2][0] + 0.5), 0, 255)
    diff = img - ref
    # encode the DIFFERENCE through the standard encoder by re-centering
    # at the level shift (the encoder subtracts 128; diff+128 cancels it)
    lvl1 = encode_jpeg([diff + 128.0], 16, 16, [(1, 1)], [0], qf)
    pay = _hier_stream(
        8, 16, 16, [(1, 1)],
        [(lvl0, False, None), (lvl1, True, None)],
    )
    _, _, pl = decode_jpeg(pay)
    fine_err = float(np.max(np.abs(pl[0] - img)))
    coarse_err = float(np.max(np.abs(ref - img)))
    assert fine_err <= 6.0  # q=1 quantization + two integer roundings
    assert fine_err < coarse_err / 2
    # malformed: EXP before a non-differential frame
    bad = _hier_stream(
        8, 16, 16, [(1, 1)], [(lvl0, False, (1, 1))]
    )
    with pytest.raises(ValueError, match="EXP"):
        decode_jpeg(bad)


def test_hierarchical_three_levels_and_seq_arith_differential():
    """Three-level pyramid mixing entropy coders: Huffman SOF0 base,
    arithmetic SOF13 differential middle, lossless SOF7 final — the
    output is bit-exact vs the source (final lossless correction), and
    the DHP stream reports the full-resolution dims."""
    rng = np.random.RandomState(43)
    base = np.cumsum(rng.randint(-5, 6, (16, 16)), axis=1)
    src = np.clip(base + 120, 0, 255).astype(np.int64)
    q = {0: np.full((8, 8), 8.0)}
    qf = {0: np.ones((8, 8))}
    l0 = src[::2, ::2]
    lvl0 = encode_jpeg([l0.astype(np.float64)], 8, 8, [(1, 1)], [0], q)
    ref0 = np.clip(np.floor(decode_jpeg(lvl0)[2][0] + 0.5), 0, 255)
    ref1_pred = _exp_up_mirror(ref0, 1, 1)[:16, :16]
    diff1 = src - ref1_pred
    lvl1 = encode_jpeg_arith(
        [diff1.astype(np.float64) + 128.0], 16, 16, [(1, 1)], [0], qf
    )
    diff1_rec = np.clip(
        np.floor(decode_jpeg(
            encode_jpeg_arith(
                [diff1.astype(np.float64) + 128.0], 16, 16, [(1, 1)], [0], qf
            )
        )[2][0] + 0.5) - 128.0, -9999, 9999,
    )
    ref1 = np.clip(ref1_pred + diff1_rec, 0, 255).astype(np.int64)
    diff2 = (src - ref1) & 0xFFFF
    lvl2 = encode_jpeg_lossless([diff2], 16, 16, 0)
    pay = _hier_stream(
        8, 16, 16, [(1, 1)],
        [(lvl0, False, None), (lvl1, True, (1, 1)), (lvl2, True, None)],
    )
    ww, hh, pl, prec = decode_jpeg(pay, with_precision=True)
    assert (ww, hh, prec) == (16, 16, 8)
    assert np.array_equal(pl[0], src)


def test_hierarchical_color_subsampled_lossless():
    """Color 4:2:0 hierarchical: per-component references at their own
    resolutions, per-component EXP upsampling, interleaved differential
    scans — bit-exact on all three planes."""
    rng = np.random.RandomState(44)
    y = rng.randint(0, 256, (12, 16)).astype(np.int64)
    cb = rng.randint(0, 256, (6, 8)).astype(np.int64)
    cr = rng.randint(0, 256, (6, 8)).astype(np.int64)
    sampling = [(2, 2), (1, 1), (1, 1)]
    lows = [p[::2, ::2] for p in (y, cb, cr)]
    lvl0 = encode_jpeg_lossless(lows, 8, 6, 2, sampling=sampling)
    refs = [_exp_up_mirror(lo, 1, 1) for lo in lows]
    diffs = [
        (p - r[: p.shape[0], : p.shape[1]]) & 0xFFFF
        for p, r in zip((y, cb, cr), refs)
    ]
    lvl1 = encode_jpeg_lossless(diffs, 16, 12, 0, sampling=sampling)
    pay = _hier_stream(
        8, 12, 16, sampling,
        [(lvl0, False, None), (lvl1, True, (1, 1))],
    )
    ww, hh, pl = decode_jpeg(pay)
    assert (ww, hh) == (16, 12)
    for a, b in zip(pl, (y, cb, cr)):
        assert np.array_equal(a, b)
