"""Deterministic mutation fuzz over every from-scratch decoder: valid
payloads from the repo's own test encoders, then seeded bit flips and
truncations. The S9 per-row contract only needs the extractors' broad
``except Exception`` — so the invariant here is TERMINATION and exception
SANITY (an ordinary Exception, never a hang, never SystemExit/MemoryError
via unbounded allocation). Every decoder walk must make progress on
arbitrary bytes; this is the test that would catch a non-advancing parse
loop before a poisoned 100-TB batch does."""

import numpy as np
import pytest

from french_admin_etl_spark.operators.multimodal import (
    _decode_wav_generic,
    decode_image,
)
from french_admin_etl_spark.operators.video import decode_video_frames

from test_jpeg import (
    encode_jpeg,
    encode_jpeg_arith,
    encode_jpeg_arith_prog,
    encode_jpeg_lossless,
    encode_jpeg_lossless_arith,
    encode_jpeg_progressive,
)


def _mutations(payload: bytes, rng, n_flips=30, n_truncs=10):
    """Deterministic corpus: byte flips at seeded offsets, truncations at
    seeded lengths, plus a few prefix-preserving garbage tails."""
    out = []
    for _ in range(n_flips):
        i = int(rng.integers(0, len(payload)))
        b = bytearray(payload)
        b[i] ^= 1 << int(rng.integers(0, 8))
        out.append(bytes(b))
    for _ in range(n_truncs):
        out.append(payload[: int(rng.integers(1, len(payload)))])
    out.append(payload + bytes(rng.integers(0, 256, 64, dtype=np.uint8)))
    return out


def _drive(fn, corpus):
    ok = err = 0
    for p in corpus:
        try:
            res = fn(p)
            # generators (video) must be drained to execute
            if hasattr(res, "__iter__") and not isinstance(res, tuple):
                for _ in res:
                    pass
            ok += 1
        except Exception as e:  # noqa: BLE001 — the extractors catch this
            assert not isinstance(e, (SystemExit, KeyboardInterrupt))
            err += 1
    return ok, err


def _hier_lossless_pyramid(img, w, h):
    """Two-level hierarchical lossless stream (DHP + SOF3 + EXP + SOF7)
    via the test-suite encoders."""
    from test_jpeg import _exp_up_mirror, _hier_stream

    low = img[::2, ::2]
    lvl0 = encode_jpeg_lossless([low], low.shape[1], low.shape[0], 4)
    ref = _exp_up_mirror(low, 1, 1)[:h, :w]
    diff = (img - ref) & 0xFFFF
    lvl1 = encode_jpeg_lossless([diff], w, h, 0)
    return _hier_stream(
        8, h, w, [(1, 1)], [(lvl0, False, None), (lvl1, True, (1, 1))]
    )


def _valid_image_payloads():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (16, 24)).astype(np.float64)
    q = {0: np.ones((8, 8))}
    pay = {
        "jpeg": encode_jpeg([img], 24, 16, [(1, 1)], [0], q, dri=2),
        "jpeg_prog": encode_jpeg_progressive([img], 24, 16, [(1, 1)], [0], q),
        "jpeg_lossless": encode_jpeg_lossless(
            [img.astype(np.int64)], 24, 16, 4, dri=5
        ),
        "jpeg_arith": encode_jpeg_arith([img], 24, 16, [(1, 1)], [0], q, dri=2),
        "jpeg_arith_prog": encode_jpeg_arith_prog(
            [img], 24, 16, [(1, 1)], [0], q, dri=3
        ),
        "jpeg_lossless_arith": encode_jpeg_lossless_arith(
            [img.astype(np.int64)], 24, 16, 4, dri=5
        ),
        "jpeg_hier": _hier_lossless_pyramid(img.astype(np.int64), 24, 16),
        "pgm": b"P5\n24 16\n255\n" + bytes(rng.randint(0, 256, 24 * 16, dtype=np.uint8)),
        "pgm16": b"P5\n24 16\n65535\n"
        + rng.randint(0, 65536, 24 * 16).astype(">u2").tobytes(),
    }
    # BMP 24-bit, hand-rolled
    w, h = 6, 4
    stride = (w * 3 + 3) & ~3
    px = bytes(rng.randint(0, 256, stride * h, dtype=np.uint8))
    bmp = (
        b"BM" + (54 + len(px)).to_bytes(4, "little") + bytes(4)
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + bytes(24) + px
    )
    pay["bmp"] = bmp
    # TIFF via the test-suite writer: LZW+predictor gray, PackBits RGB,
    # big-endian palette — the three structurally distinct strip paths
    from test_tiff import _tiff_write

    timg = rng.randint(0, 256, (9, 11, 1)).astype(np.int64)
    pay["tiff_lzw"] = _tiff_write(timg, 8, 1, 5, "little", predictor=2)
    pay["tiff_pb_rgb"] = _tiff_write(
        np.repeat(timg, 3, axis=2), 8, 2, 32773, "little", rows_per_strip=3
    )
    cmap = rng.randint(0, 65536, (3, 16)).astype(np.uint16)
    pay["tiff_palette"] = _tiff_write(timg % 16, 4, 3, 5, "big", colormap=cmap)
    pay["tiff_tiled"] = _tiff_write(
        rng.randint(0, 256, (21, 27, 1)).astype(np.int64),
        8, 1, 5, "little", predictor=2, tile=(16, 16),
    )
    pay["tiff_deflate"] = _tiff_write(timg, 8, 1, 8, "little", rows_per_strip=4)
    # JPEG-in-TIFF with an abbreviated (tag-347 JPEGTables) strip
    from test_jpeg import _img as _jimg
    from test_jpeg import encode_jpeg as _jenc
    from test_tiff import _split_jpeg_tables, _tiff_jpeg

    jfull = _jenc([_jimg(16, 16, seed=40)], 16, 16, [(1, 1)], [0],
                  {0: np.ones((8, 8))})
    jtab, jabbr = _split_jpeg_tables(jfull)
    pay["tiff_jpeg"] = _tiff_jpeg([jabbr], 16, 16, photometric=1, tables=jtab)
    # BI_RLE4 BMP (the hand vector from test_training_ops)
    pal4 = rng.randint(0, 256, (16, 4)).astype(np.uint8)
    off4 = 14 + 40 + 64
    pay["bmp_rle4"] = (
        b"BM" + (off4 + 64).to_bytes(4, "little") + bytes(4)
        + off4.to_bytes(4, "little") + (40).to_bytes(4, "little")
        + (9).to_bytes(4, "little", signed=True)
        + (3).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (4).to_bytes(2, "little")
        + (2).to_bytes(4, "little") + bytes(12)
        + (16).to_bytes(4, "little") + bytes(4) + pal4.tobytes()
        + b"\x05\x7a\x00\x03\x56\x20\x01\x90\x00\x00"
        + b"\x00\x05\x12\x34\x50\x00\x04\xcc\x00\x00"
        + b"\x02\x3b\x00\x02\x02\x00\x03\x99\x00\x01"
    )
    # TGA (magicless: mutations may fall through to the generic
    # NotImplementedError — still an ordinary, terminating exception)
    from test_tga import _tga_write

    pay["tga_rle"] = _tga_write(
        rng.randint(0, 256, (9, 11, 3)).astype(np.int64), 10, 24, footer=True
    )
    pay["tga_pal"] = _tga_write(
        rng.randint(0, 16, (9, 11)).astype(np.int64), 1, 8,
        palette=rng.randint(0, 256, (16, 3)).astype(np.int64),
    )
    # ICO container (32-bpp DIB + palette DIB entries)
    from test_tga import _dib, _ico

    pay["ico"] = _ico([
        (8, 8, _dib(rng.randint(0, 8, (8, 8)).astype(np.int64), 8,
                    palette=rng.randint(0, 256, (256, 3)).astype(np.int64))),
        (12, 12, _dib(rng.randint(0, 256, (12, 12, 3)).astype(np.int64), 32)),
    ])
    return pay


def test_fuzz_image_decoders_terminate():
    payloads = _valid_image_payloads()
    for name, p in payloads.items():
        # the pristine payload must decode
        w, h, gray = decode_image(p)
        assert gray.shape == (h, w)
        rng = np.random.default_rng(hash(name) & 0xFFFF)
        ok, err = _drive(decode_image, _mutations(p, rng))
        assert ok + err == 41, name  # every mutation terminated


def test_fuzz_video_decoders_terminate():
    # Y4M: 3 frames of 8x6 4:2:0
    w, h = 8, 6
    rng = np.random.default_rng(11)
    frames = b"".join(
        b"FRAME\n" + bytes(rng.integers(0, 256, w * h + 2 * (w // 2) * (h // 2), dtype=np.uint8).tobytes())
        for _ in range(3)
    )
    y4m = f"YUV4MPEG2 W{w} H{h} F25:1 C420\n".encode() + frames
    for _ in decode_video_frames(y4m):
        pass
    ok, err = _drive(decode_video_frames, _mutations(y4m, rng))
    assert ok + err == 41


def test_fuzz_audio_decoder_terminates():
    rng = np.random.default_rng(23)
    import struct

    pcm = rng.integers(-30000, 30000, 400, dtype=np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    wav = (
        b"RIFF" + bytes(4) + b"WAVE"
        + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
        + b"data" + len(pcm).to_bytes(4, "little") + pcm
    )
    assert _decode_wav_generic(wav)[2] == 400
    ok, err = _drive(_decode_wav_generic, _mutations(wav, rng))
    assert ok + err == 41

    from french_admin_etl_spark.operators.multimodal import _decode_aiff, _decode_au
    from test_training_ops import _aiff, _au

    au = _au(3, 1, 8000, rng.integers(-30000, 30000, 200, dtype=np.int16).astype(">i2").tobytes())
    assert _decode_au(au)[2] == 200
    ok, err = _drive(_decode_au, _mutations(au, rng))
    assert ok + err == 41
    aiff = _aiff(1, 150, 16, 22050, rng.integers(-30000, 30000, 150, dtype=np.int16).astype(">i2").tobytes(), comp=b"sowt")
    assert _decode_aiff(aiff)[2] == 150
    ok, err = _drive(_decode_aiff, _mutations(aiff, rng))
    assert ok + err == 41


def test_fuzz_flac_decoder_terminates():
    from french_admin_etl_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(29)
    import math

    x = [int(9000 * math.sin(i / 20)) for i in range(700)]
    for name, blob in (
        ("fixed", encode_flac([x], 8000, bps=16, blocksize=256)),
        ("stereo_lpc", encode_flac(
            [x, [v + 100 for v in x]], 44100, bps=16, blocksize=192,
            stereo_mode="mid_side", lpc=([1400, -600], 12, 10), part_order=1,
        )),
    ):
        assert decode_flac(blob)[3][0] == x  # pristine must decode
        ok, err = _drive(decode_flac, _mutations(blob, rng))
        assert ok + err == 41, name


def test_fuzz_gif_png_avi_terminate():
    import struct
    import zlib

    from test_training_ops import _gif_encode
    from test_video import _avi, _avi_mjpeg, _gif_animated

    rng0 = np.random.RandomState(5)
    pal = rng0.randint(0, 256, (8, 3))
    idx = rng0.randint(0, 8, (9, 7)).astype(np.uint8)
    gif = _gif_encode(idx, pal, 3, interlaced=True)

    # minimal 8-bit gray PNG, filter 0 rows
    gpx = rng0.randint(0, 256, (6, 5), dtype=np.uint8)
    raw = b"".join(b"\x00" + r.tobytes() for r in gpx)

    def chunk(tag, body):
        c = tag + body
        return len(body).to_bytes(4, "big") + c + zlib.crc32(c).to_bytes(4, "big")

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )

    frames = [rng0.randint(0, 256, ((4, 6, 3)), ).astype(np.uint8) for _ in range(2)]
    avi = _avi(frames, 6, 4)
    jp = encode_jpeg(
        [rng0.randint(0, 256, (8, 8)).astype(np.float64)], 8, 8,
        [(1, 1)], [0], {0: np.ones((8, 8))},
    )
    mjpeg = _avi_mjpeg([jp, jp], 8, 8)
    anim = _gif_animated(
        7, 9, pal,
        [(idx, 0, 0, 0, None), (idx[:4, :3].copy(), 2, 1, 2, 3)],
    )
    from test_video import _apng

    apng = _apng(
        5, 4, 6,
        [
            (rng0.randint(0, 256, (4, 5, 4)).astype(np.uint8), 0, 0, 0, 0),
            (rng0.randint(0, 256, (2, 3, 4)).astype(np.uint8), 1, 1, 2, 1),
        ],
    )

    for name, p, fn in (
        ("gif", gif, decode_image),
        ("png", png, decode_image),
        ("avi", avi, decode_video_frames),
        ("mjpeg", mjpeg, decode_video_frames),
        ("gif_anim", anim, decode_video_frames),
        ("apng", apng, decode_video_frames),
    ):
        res = fn(p)  # pristine must decode / iterate
        if hasattr(res, "__iter__") and not isinstance(res, tuple):
            assert sum(1 for _ in res) >= 1
        rng = np.random.default_rng(hash(name) & 0xFFFF)
        ok, err = _drive(fn, _mutations(p, rng))
        assert ok + err == 41, name
