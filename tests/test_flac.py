"""FLAC codec tests (operators/flac.py): round-trips through the mirror
encoder over every decoder branch, PLUS hand-assembled bitstreams and
published CRC check values that pin the spec conventions INDEPENDENTLY of
the mirror — the round-5 lossless-JPEG lesson: an encoder and decoder
sharing one wrong rule still round-trip, so the load-bearing conventions
(unary polarity, zigzag mapping, field order, CRC polynomials) each get
an anchor the mirror never touched."""

import math
import random

import pytest

from french_admin_etl_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _read_coded_number,
    _write_coded_number,
    decode_flac,
    decode_flac_audio,
    encode_flac,
)


# --------------------------------------------------------------- anchors


def test_crc_published_check_values():
    """CRC-8 (poly 0x07, init 0) and CRC-16/BUYPASS (poly 0x8005, init 0,
    non-reflected) — FLAC's two frame CRCs — have published check values
    over b"123456789": 0xF4 and 0xFEE8. A wrong polynomial, init, or
    reflection convention fails here regardless of what the mirror
    encoder does."""
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_crc_bitwise_cross_check():
    """The table-driven CRCs equal a direct bit-by-bit long division."""
    rng = random.Random(3)
    data = bytes(rng.randrange(256) for _ in range(257))

    def bitwise(data, poly, width):
        crc = 0
        top = 1 << (width - 1)
        for byte in data:
            crc ^= byte << (width - 8)
            for _ in range(8):
                crc = ((crc << 1) ^ poly) if crc & top else crc << 1
                crc &= (1 << width) - 1
        return crc

    assert _crc8(data) == bitwise(data, 0x07, 8)
    assert _crc16(data) == bitwise(data, 0x8005, 16)


def _hand_streaminfo(rate, nch, bps, total, min_bs, max_bs, last=True):
    body = min_bs.to_bytes(2, "big") + max_bs.to_bytes(2, "big")
    body += b"\x00\x00\x00" * 2  # frame sizes unknown
    packed = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | total
    body += packed.to_bytes(8, "big") + b"\x00" * 16  # MD5 unset
    return bytes([0x80 if last else 0x00]) + len(body).to_bytes(3, "big") + body


def test_hand_assembled_constant_frame():
    """A stream built byte-by-byte from the spec text alone: mono, 8-bit,
    one 16-sample frame holding a CONSTANT subframe of value 42. Pins the
    frame-header field order, the 8-bit-blocksize-minus-1 convention, the
    subframe type code for CONSTANT, and both CRC spans."""
    header = bytes(
        [
            0xFF, 0xF8,  # sync 11111111111110, reserved 0, fixed blocking
            0x64,        # blocksize code 6 (8-bit follows), rate code 4 (8 kHz)
            0x02,        # channels code 0 (mono), sample size 001 (8-bit), res 0
            0x00,        # coded frame number 0
            0x0F,        # blocksize - 1 = 15
        ]
    )
    frame = header + bytes([_crc8(header)])
    # subframe: pad 0, type 000000 (CONSTANT), wasted flag 0 -> byte 0x00,
    # then the 8-bit signed constant 42
    frame += bytes([0x00, 42])
    frame += _crc16(frame).to_bytes(2, "big")
    blob = b"fLaC" + _hand_streaminfo(8000, 1, 8, 16, 16, 16) + frame
    nch, rate, bps, chans = decode_flac(blob)
    assert (nch, rate, bps) == (1, 8000, 8)
    assert chans == [[42] * 16]


def test_hand_assembled_fixed_rice_frame():
    """Hand-derived FIXED order-1 frame with rice-coded residuals. Samples
    [10, 12, 11, 13] -> order-1 residuals [2, -1, 2] -> zigzag [4, 1, 4]
    -> rice(param=2) quotients in FLAC unary (q ZERO bits then a one) with
    2 remainder bits. Wrong unary polarity, wrong zigzag, or a wrong
    fixed-predictor sign fails this without any mirror-encoder help."""
    bits = ""
    bits += "0" + "001001" + "0"          # pad, type FIXED order 1, no wasted
    bits += format(10, "08b")             # warm-up sample
    bits += "00" + "0000"                 # residual method 0, partition order 0
    bits += "0010"                        # rice parameter 2
    bits += "01" + "00"                   # u=4: q=1 -> 01, remainder 00
    bits += "1" + "01"                    # u=1: q=0 -> 1, remainder 01
    bits += "01" + "00"                   # u=4
    bits += "0" * (-len(bits) % 8)        # pad frame to byte boundary
    subframe = int(bits, 2).to_bytes(len(bits) // 8, "big")

    header = bytes(
        [
            0xFF, 0xF8,
            0x64,  # blocksize code 6, rate code 4
            0x02,  # mono, 8-bit
            0x00,  # frame number 0
            0x03,  # blocksize - 1 = 3
        ]
    )
    frame = header + bytes([_crc8(header)]) + subframe
    frame += _crc16(frame).to_bytes(2, "big")
    blob = b"fLaC" + _hand_streaminfo(8000, 1, 8, 4, 4, 4) + frame
    _, _, _, chans = decode_flac(blob)
    assert chans == [[10, 12, 11, 13]]


def test_coded_number_boundaries():
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 1 << 20, (1 << 36) - 1):
        bw = _BitWriter()
        _write_coded_number(bw, v)
        bw.align()
        assert _read_coded_number(_BitReader(bw.bytes())) == v
    # spec examples: 0x80 encodes as UTF-8 two-byte 0xC2 0x80
    bw = _BitWriter()
    _write_coded_number(bw, 0x80)
    bw.align()
    assert bw.bytes() == b"\xc2\x80"


# ------------------------------------------------------------ round-trips


def _sine(n, amp=12000, period=30.0, phase=0.0):
    return [int(amp * math.sin(i / period + phase)) for i in range(n)]


def _roundtrip(channels, rate, bps, **kw):
    blob = encode_flac(channels, rate, bps=bps, **kw)
    nch, r, b, out = decode_flac(blob)
    assert (nch, r, b) == (len(channels), rate, bps)
    assert out == channels
    return blob


def test_roundtrip_fixed_multiframe_compresses():
    x = _sine(10_000)
    blob = _roundtrip([x], 44100, 16, blocksize=4096)
    assert len(blob) < 10_000 * 2 // 2  # a smooth signal beats raw 2x+


def test_roundtrip_stereo_modes_exact():
    left = _sine(3000)
    # right = left + constant offset: the side channel collapses to a
    # CONSTANT subframe, so every joint mode must beat independent
    right = [v + 100 for v in left]
    blobs = {}
    for mode in ("independent", "left_side", "right_side", "mid_side"):
        blobs[mode] = _roundtrip(
            [left, right], 48000, 16, blocksize=1024, stereo_mode=mode
        )
    # correlated stereo: every decorrelated mode beats independent
    assert all(
        len(blobs[m]) < len(blobs["independent"])
        for m in ("left_side", "right_side", "mid_side")
    )


def test_roundtrip_lpc_partitions():
    x = _sine(2048)
    # forced quantized LPC (coefs, precision, shift): residuals are
    # computed with the decoder's exact integer formula, so any in-range
    # coefficients must reconstruct bit-exactly
    _roundtrip([x], 16000, 16, blocksize=1024, lpc=([1400, -600, 200], 12, 10),
               part_order=2)
    _roundtrip([x], 16000, 16, blocksize=512, lpc=([2047], 12, 11),
               part_order=3)
    # a coefficient outside the signed precision range must be refused by
    # the encoder, not silently wrapped into a wrong-but-valid stream
    with pytest.raises(AssertionError):
        encode_flac([x], 16000, bps=16, blocksize=512, lpc=([2048], 12, 11))


def test_roundtrip_wasted_bits():
    x = [(v >> 3) << 3 for v in _sine(1024)]
    plain = encode_flac([_sine(1024)], 22050, 16, blocksize=256)
    shifted = _roundtrip([x], 22050, 16, blocksize=256)
    assert len(shifted) < len(plain)  # the wasted-bits path engaged


def test_roundtrip_noise_verbatim_and_escape():
    rng = random.Random(7)
    z = [rng.randrange(-(1 << 15), 1 << 15) for _ in range(2000)]
    _roundtrip([z], 8000, 16, blocksize=512, verbatim=True)
    _roundtrip([z], 8000, 16, blocksize=512)
    small = [rng.randrange(-100, 100) for _ in range(768)]
    _roundtrip([small], 192000, 16, blocksize=192, escape_raw_bits=9)
    # escape with raw_bits=0 encodes an all-zero partition in zero bits
    _roundtrip([[0] * 512], 8000, 16, blocksize=256, verbatim=False,
               escape_raw_bits=0, lpc=([0], 12, 0))


def test_roundtrip_depths_channels_blocking():
    rng = random.Random(11)
    _roundtrip([[rng.randrange(-128, 128) for _ in range(600)]], 11025, 8,
               blocksize=200)
    _roundtrip([[rng.randrange(-(1 << 23), 1 << 23) for _ in range(500)]],
               96000, 24, blocksize=250)
    _roundtrip([_sine(999)], 44100, 16, blocksize=250, variable_blocking=True)
    _roundtrip([_sine(500)], 44100, 16, blocksize=256, padding_block=True)
    _roundtrip([[rng.randrange(-1000, 1000) for _ in range(300)]
                for _ in range(6)], 48000, 16, blocksize=100)
    _roundtrip([[77] * 1000], 8000, 16, blocksize=500)  # CONSTANT subframes
    # non-table rate -> 16-bit-Hz header path; table rate 192k; odd tail
    _roundtrip([_sine(700)], 12345, 16, blocksize=192)


def test_corruption_detected():
    x = _sine(1000)
    blob = bytearray(encode_flac([x], 44100, 16, blocksize=256))
    with pytest.raises(ValueError):
        decode_flac(b"RIFF" + bytes(blob[4:]))
    # flip one bit inside the last frame's audio payload -> CRC-16 trips
    bad = bytearray(blob)
    bad[-5] ^= 0x10
    with pytest.raises(ValueError):
        decode_flac(bytes(bad))
    # tamper the stored MD5 -> decoded-stream signature mismatch
    bad = bytearray(blob)
    bad[26] ^= 0xFF  # inside STREAMINFO's 16-byte MD5 field
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    # truncation anywhere must raise, never hang
    for cut in (3, 7, 20, 41, 42, 60, len(blob) - 1):
        with pytest.raises(ValueError):
            decode_flac(bytes(blob[:cut]))


def test_extract_audio_features_flac(spark):
    """The DataFrame path: FLAC payloads decode through the same Arrow
    mapInPandas feature extractor as WAV, corrupt FLAC dead-letters per
    row (S9), and the RMS contour matches the known signal."""
    from french_admin_etl_spark.operators.multimodal import (
        extract_audio_features,
    )

    rate = 8000
    # first half silent, second half a full-scale square wave -> RMS 0 / 1
    x = [0] * rate + [32767 if i % 2 else -32767 for i in range(rate)]
    blob = encode_flac([x], rate, bps=16, blocksize=4096)
    media = spark.createDataFrame(
        [
            (1, "audio", "audio/flac", blob),
            (2, "audio", "audio/flac", blob[:40]),  # truncated: per-row err
        ],
        "media_id int, kind string, mime string, payload binary",
    )
    out = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    ok = out[1]
    assert ok["err"] is None
    assert ok["n_channels"] == 1 and ok["sample_rate"] == rate
    assert ok["n_frames"] == 2 * rate and ok["duration_sec"] == 2.0
    rms = ok["rms_segments"]
    assert all(abs(v) < 1e-6 for v in rms[:4])
    assert all(abs(v - 1.0) < 1e-3 for v in rms[4:])
    assert out[2]["err"] is not None and "FLAC" in out[2]["err"]
