"""From-scratch FLAC (Free Lossless Audio Codec) decode — no external
libraries, implemented directly from the public specification (RFC 9639 /
xiph.org format docs). Closes the compressed-audio seam one real codec
further: unlike MP3 (whose polyphase synthesis window is a 512-entry
non-formulaic table), every piece of FLAC is derivable from the spec
text alone — rice/unary entropy coding, fixed and LPC predictors with
in-stream quantized coefficients, stereo decorrelation, CRC-8/CRC-16
polynomials, and the UTF-8-style frame-number coding.

Decoder surface (all of it exercised by tests/test_flac.py):

- STREAMINFO parsing + trailing-metadata skip (any block type).
- Frame headers: all block-size codes (192, 576*2^n, 256*2^n, 8/16-bit
  explicit), sample-rate codes (table + 8-bit-kHz / 16-bit-Hz /
  16-bit-daHz + streaminfo reference), sample sizes 8/12/16/20/24/32,
  fixed and variable blocking strategies, CRC-8 header check.
- Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (4-bit precision-1, 5-bit signed shift, signed quantized coefficients)
  and the wasted-bits unary prefix.
- Residual: 4-bit (method 0) and 5-bit (method 1) rice parameters,
  partition orders 0-15, escape-to-raw partitions.
- Stereo decorrelation: independent, left/side, right/side, mid/side
  (side channels carry bps+1 bits).
- Frame CRC-16 verification and (for byte-aligned bps) the STREAMINFO
  MD5 signature of the decoded stream.

The mirror encoder (``encode_flac``) exists for round-trip testing and
emits the same full surface (constant detection, fixed-order search,
forced LPC with caller-given quantized coefficients, all four stereo
modes, wasted-bits detection, partitioned rice with escape support), so
every decoder branch is reachable from a stream the tests build — plus
hand-assembled bitstreams in the tests pin the spec conventions the
round trip alone could not (the round-5 lossless-JPEG lesson: an encoder
and decoder sharing one wrong rule still round-trip).

Reference parity note: the reference pipeline (xvThomas/french-admin-etl)
has no media path at all — this module belongs to the training-data
extensions, feeding ``extract_audio_features``
(operators/multimodal.py) where compressed payloads would otherwise
dead-letter per row (S9).
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["decode_flac", "decode_flac_audio", "encode_flac"]


# --------------------------------------------------------------------------
# CRCs (FLAC frame integrity): CRC-8 poly x^8+x^2+x+1 (0x07) over the frame
# header, CRC-16 poly x^16+x^15+x^2+1 (0x8005) over the whole frame. Both
# MSB-first, init 0, no reflection — per the format spec.

def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    table = []
    for byte in range(256):
        crc = byte << (width - 8)
        for _ in range(8):
            crc = ((crc << 1) ^ poly) if crc & top else (crc << 1)
        table.append(crc & mask)
    return table


_CRC8_TABLE = _crc_table(0x07, 8)
_CRC16_TABLE = _crc_table(0x8005, 16)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = _CRC8_TABLE[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFF) ^ _CRC16_TABLE[(crc >> 8) ^ b]
    return crc


# --------------------------------------------------------------------------
# MSB-first bit IO. The reader tracks its byte position so frame CRCs can
# hash the exact consumed span; unary runs are scanned bytewise (a rice
# quotient is almost always short, but escape-free pathological streams
# must still terminate).


class _BitReader:
    __slots__ = ("buf", "pos", "bit")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos  # byte index
        self.bit = 0  # bits already consumed within buf[pos]

    def read(self, n: int) -> int:
        """Read n bits MSB-first as an unsigned int."""
        out = 0
        while n > 0:
            if self.pos >= len(self.buf):
                raise ValueError("FLAC bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.buf[self.pos]
            out = (out << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            n -= take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count 0-bits up to the terminating 1-bit (FLAC unary)."""
        n = 0
        while True:
            if self.pos >= len(self.buf):
                raise ValueError("FLAC bitstream truncated in unary run")
            byte = self.buf[self.pos]
            rem = 8 - self.bit
            chunk = byte & ((1 << rem) - 1)
            if chunk == 0:
                n += rem
                self.bit = 0
                self.pos += 1
                continue
            lead = rem - chunk.bit_length()
            n += lead
            self.bit += lead + 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            return n

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then the terminating 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


# --------------------------------------------------------------------------
# UTF-8-style coded numbers (frame/sample ordinal): standard UTF-8 byte
# layout extended to 7-byte sequences so 36-bit sample numbers fit.


def _read_coded_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    probe = b0
    while probe & 0x40:
        n += 1
        probe <<= 1
    if n == 0 or n > 6:
        raise ValueError(f"invalid coded-number lead byte 0x{b0:02x}")
    val = b0 & (0x3F >> n)
    for _ in range(n):
        nb = br.read(8)
        if nb & 0xC0 != 0x80:
            raise ValueError("invalid coded-number continuation byte")
        val = (val << 6) | (nb & 0x3F)
    return val


def _write_coded_number(bw: _BitWriter, val: int) -> None:
    if val < 0x80:
        bw.write(val, 8)
        return
    for n in range(1, 7):  # n continuation bytes
        lead_bits = 6 - n if n < 6 else 0
        if val < (1 << (lead_bits + 6 * n)):
            ones = (0xFF << (7 - n)) & 0xFF  # n+1 one-bits then a zero
            bw.write(ones | (val >> (6 * n)), 8)
            for i in range(n - 1, -1, -1):
                bw.write(0x80 | ((val >> (6 * i)) & 0x3F), 8)
            return
    raise ValueError("coded number exceeds 36 bits")


# --------------------------------------------------------------------------
# Tables straight from the format spec (these are short *code maps*, not
# signal-processing constants — every entry is spelled out in the spec's
# frame-header section).

_BLOCKSIZE_CODES = {
    0x1: 192,
    0x2: 576, 0x3: 1152, 0x4: 2304, 0x5: 4608,
    0x8: 256, 0x9: 512, 0xA: 1024, 0xB: 2048,
    0xC: 4096, 0xD: 8192, 0xE: 16384, 0xF: 32768,
}
_SAMPLE_RATE_CODES = {
    0x1: 88200, 0x2: 176400, 0x3: 192000, 0x4: 8000, 0x5: 16000,
    0x6: 22050, 0x7: 24000, 0x8: 32000, 0x9: 44100, 0xA: 48000,
    0xB: 96000,
}
_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

# fixed predictor residual: e[i] = sum_j coef[j] * x[i-1-j] subtracted from
# x[i]; orders 0-4 are the binomial differences from the spec
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _zigzag_decode(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _zigzag_encode(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


# --------------------------------------------------------------------------
# Decoder


def _read_residual(br: _BitReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"reserved residual coding method {method}")
    param_bits = 4 + method
    escape = (1 << param_bits) - 1
    part_order = br.read(4)
    nparts = 1 << part_order
    if blocksize % nparts:
        raise ValueError("block size not divisible by partition count")
    part_len = blocksize >> part_order
    out: list[int] = []
    for p in range(nparts):
        n = part_len - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("first partition shorter than predictor order")
        param = br.read(param_bits)
        if param == escape:
            raw_bits = br.read(5)
            if raw_bits == 0:
                out.extend([0] * n)
            else:
                out.extend(br.read_signed(raw_bits) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                u = (q << param) | br.read(param)
                out.append(_zigzag_decode(u))
    return out


def _read_subframe(br: _BitReader, blocksize: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("subframe header padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff_bps = bps - wasted
    if eff_bps <= 0:
        raise ValueError("wasted bits exceed sample size")

    if sf_type == 0:  # CONSTANT
        v = br.read_signed(eff_bps)
        samples = [v] * blocksize
    elif sf_type == 1:  # VERBATIM
        samples = [br.read_signed(eff_bps) for _ in range(blocksize)]
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type - 8
        if order > blocksize:
            raise ValueError("predictor order exceeds block size")
        samples = [br.read_signed(eff_bps) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(resid):
            base = i + order
            pred = sum(c * samples[base - 1 - j] for j, c in enumerate(coefs))
            samples.append(e + pred)
    elif sf_type >= 32:  # LPC, order = low 5 bits + 1
        order = (sf_type & 0x1F) + 1
        if order > blocksize:
            raise ValueError("predictor order exceeds block size")
        samples = [br.read_signed(eff_bps) for _ in range(order)]
        prec = br.read(4)
        if prec == 0xF:
            raise ValueError("invalid LPC precision code 15")
        prec += 1
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        resid = _read_residual(br, blocksize, order)
        for i, e in enumerate(resid):
            base = i + order
            acc = sum(c * samples[base - 1 - j] for j, c in enumerate(coefs))
            samples.append(e + (acc >> shift))
    else:
        raise ValueError(f"reserved subframe type {sf_type}")

    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(buf: bytes, pos: int, info: dict):
    """Decode one frame starting at byte ``pos``; returns
    (channel sample lists, new pos, frame meta dict)."""
    br = _BitReader(buf, pos)
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError(f"bad frame sync 0x{sync:04x}")
    if br.read(1):
        raise ValueError("frame header reserved bit set")
    variable = br.read(1)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("frame header reserved bit 2 set")
    ordinal = _read_coded_number(br)

    if bs_code == 0:
        raise ValueError("reserved block size code 0")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODES[bs_code]

    if sr_code == 0:
        rate = info["sample_rate"]
    elif sr_code == 0xC:
        rate = br.read(8) * 1000
    elif sr_code == 0xD:
        rate = br.read(16)
    elif sr_code == 0xE:
        rate = br.read(16) * 10
    elif sr_code == 0xF:
        raise ValueError("invalid sample rate code 15")
    else:
        rate = _SAMPLE_RATE_CODES[sr_code]

    if ss_code == 0:
        bps = info["bits_per_sample"]
    elif ss_code in _SAMPLE_SIZE_CODES:
        bps = _SAMPLE_SIZE_CODES[ss_code]
    else:
        raise ValueError(f"reserved sample size code {ss_code}")

    header_crc = _crc8(buf[pos : br.pos])
    if br.read(8) != header_crc:
        raise ValueError("frame header CRC-8 mismatch")

    if ch_code <= 7:
        nch = ch_code + 1
        chans = [_read_subframe(br, blocksize, bps) for _ in range(nch)]
    elif ch_code in (8, 9, 10):
        nch = 2
        # the difference channel carries one extra bit
        if ch_code == 8:  # left/side
            left = _read_subframe(br, blocksize, bps)
            side = _read_subframe(br, blocksize, bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _read_subframe(br, blocksize, bps + 1)
            right = _read_subframe(br, blocksize, bps)
            chans = [[r + s for r, s in zip(right, side)], right]
        else:  # mid/side: mid lost L+R's LSB, recovered from side parity
            mid = _read_subframe(br, blocksize, bps)
            side = _read_subframe(br, blocksize, bps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m2 = (m << 1) | (s & 1)
                left.append((m2 + s) >> 1)
                right.append((m2 - s) >> 1)
            chans = [left, right]
    else:
        raise ValueError(f"reserved channel assignment {ch_code}")

    br.align()
    frame_crc = _crc16(buf[pos : br.pos])
    stored = br.read(16)
    if stored != frame_crc:
        raise ValueError("frame CRC-16 mismatch")
    meta = {
        "blocksize": blocksize,
        "rate": rate,
        "bps": bps,
        "nch": nch,
        "ordinal": ordinal,
        "variable": bool(variable),
    }
    return chans, br.pos, meta


def decode_flac(payload: bytes):
    """Decode a complete FLAC stream.

    Returns ``(nch, rate, bps, channels)`` where ``channels`` is a list
    of per-channel Python int sample lists at native bit depth. Raises
    ``ValueError`` on any structural or CRC error (per-row S9 upstream).
    Verifies the STREAMINFO MD5 signature when present and the bit depth
    is byte-aligned (the spec's MD5 runs over the little-endian
    byte-aligned interleaved stream)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC metadata truncated")
        hdr = payload[pos]
        last, btype = hdr & 0x80, hdr & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("FLAC metadata block truncated")
        if btype == 0:  # STREAMINFO
            if blen != 34:
                raise ValueError(f"STREAMINFO length {blen} != 34")
            bits = int.from_bytes(body[10:18], "big")
            info = {
                "min_blocksize": int.from_bytes(body[0:2], "big"),
                "max_blocksize": int.from_bytes(body[2:4], "big"),
                "sample_rate": bits >> 44,
                "channels": ((bits >> 41) & 0x7) + 1,
                "bits_per_sample": ((bits >> 36) & 0x1F) + 1,
                "total_samples": bits & ((1 << 36) - 1),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise ValueError("invalid metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if info is None:
        raise ValueError("FLAC stream missing STREAMINFO")

    channels = [[] for _ in range(info["channels"])]
    rate = info["sample_rate"]
    bps = info["bits_per_sample"]
    while pos < len(payload):
        chans, pos, meta = _decode_frame(payload, pos, info)
        if meta["nch"] != info["channels"]:
            raise ValueError("frame channel count differs from STREAMINFO")
        if meta["bps"] != bps or meta["rate"] != rate:
            raise ValueError("frame bps/rate differs from STREAMINFO")
        for ch, samples in zip(channels, chans):
            ch.extend(samples)

    total = info["total_samples"]
    if total and any(len(c) != total for c in channels):
        raise ValueError(
            f"decoded {len(channels[0])} samples, STREAMINFO says {total}"
        )
    if info["md5"] != b"\x00" * 16 and bps % 8 == 0:
        width = bps // 8
        h = hashlib.md5()
        mask = (1 << bps) - 1
        buf = bytearray()
        for i in range(len(channels[0])):
            for c in channels:
                buf += (c[i] & mask).to_bytes(width, "little")
        h.update(bytes(buf))
        if h.digest() != info["md5"]:
            raise ValueError("decoded stream MD5 mismatch")
    return info["channels"], rate, bps, channels


def decode_flac_audio(payload: bytes):
    """``_decode_wav_generic``-shaped adapter: returns
    ``(nch, rate, n_frames, mono float64 in [-1, 1])`` for
    ``extract_audio_features``."""
    import numpy as np

    nch, rate, bps, channels = decode_flac(payload)
    n = len(channels[0]) if channels else 0
    arr = np.array(channels, dtype=np.float64)
    mono = arr.mean(axis=0) / float(1 << (bps - 1)) if n else np.zeros(0)
    return nch, rate, n, mono


# --------------------------------------------------------------------------
# Mirror encoder (test twin). Emits spec-conformant streams covering every
# decoder branch; NOT a compression-ratio contender.


def _encode_residual(bw: _BitWriter, resid: list[int], blocksize: int,
                     order: int, part_order: int, param_bits: int = 4,
                     escape_raw_bits: int | None = None) -> None:
    assert blocksize % (1 << part_order) == 0
    bw.write(0 if param_bits == 4 else 1, 2)
    bw.write(part_order, 4)
    part_len = blocksize >> part_order
    escape = (1 << param_bits) - 1
    idx = 0
    for p in range(1 << part_order):
        n = part_len - (order if p == 0 else 0)
        chunk = resid[idx : idx + n]
        idx += n
        if escape_raw_bits is not None:
            bw.write(escape, param_bits)
            bw.write(escape_raw_bits, 5)
            if escape_raw_bits:
                for v in chunk:
                    bw.write(v, escape_raw_bits)
            continue
        # pick the best rice parameter for this partition
        best_p, best_cost = 0, None
        for param in range(escape):
            cost = sum((_zigzag_encode(v) >> param) + 1 + param for v in chunk)
            if best_cost is None or cost < best_cost:
                best_p, best_cost = param, cost
        bw.write(best_p, param_bits)
        for v in chunk:
            u = _zigzag_encode(v)
            bw.write_unary(u >> best_p)
            bw.write(u & ((1 << best_p) - 1), best_p)
    assert idx == len(resid)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int,
                     lpc: tuple[list[int], int, int] | None,
                     part_order: int, escape_raw_bits: int | None,
                     verbatim: bool) -> None:
    blocksize = len(samples)
    wasted = 0
    if any(samples):
        # wasted-bits detection: common trailing zero bits
        ors = 0
        for s in samples:
            ors |= s
        while not ors & 1:
            wasted += 1
            ors >>= 1
    else:
        wasted = 0
    eff = [s >> wasted for s in samples]
    eff_bps = bps - wasted

    if all(s == eff[0] for s in eff) and not verbatim and lpc is None:
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        _write_wasted(bw, wasted)
        bw.write(eff[0], eff_bps)
        return
    if verbatim:
        bw.write(0, 1)
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for s in eff:
            bw.write(s, eff_bps)
        return
    if lpc is not None:
        coefs, prec, shift = lpc
        order = len(coefs)
        assert all(-(1 << (prec - 1)) <= c < (1 << (prec - 1)) for c in coefs)
        bw.write(0, 1)
        bw.write(0x20 | (order - 1), 6)
        _write_wasted(bw, wasted)
        for s in eff[:order]:
            bw.write(s, eff_bps)
        bw.write(prec - 1, 4)
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c, prec)
        resid = []
        for i in range(order, blocksize):
            acc = sum(c * eff[i - 1 - j] for j, c in enumerate(coefs))
            resid.append(eff[i] - (acc >> shift))
        _encode_residual(bw, resid, blocksize, order, part_order,
                         escape_raw_bits=escape_raw_bits)
        return
    # FIXED: pick the order (0-4) minimizing sum |residual|
    best = None
    for order, coefs in _FIXED_COEFS.items():
        if order > blocksize or (blocksize >> part_order) <= order:
            continue
        resid = [
            eff[i] - sum(c * eff[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        cost = sum(abs(v) for v in resid)
        if best is None or cost < best[0]:
            best = (cost, order, resid)
    _, order, resid = best
    bw.write(0, 1)
    bw.write(8 + order, 6)
    _write_wasted(bw, wasted)
    for s in eff[:order]:
        bw.write(s, eff_bps)
    _encode_residual(bw, resid, blocksize, order, part_order,
                     escape_raw_bits=escape_raw_bits)


def _write_wasted(bw: _BitWriter, wasted: int) -> None:
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def encode_flac(channels, rate: int, bps: int = 16, blocksize: int = 4096,
                stereo_mode: str = "independent",
                lpc: tuple[list[int], int, int] | None = None,
                part_order: int = 0, escape_raw_bits: int | None = None,
                verbatim: bool = False, variable_blocking: bool = False,
                write_md5: bool = True, padding_block: bool = False) -> bytes:
    """Mirror FLAC encoder for tests. ``channels`` = list of per-channel
    int sample lists (equal lengths). ``stereo_mode`` ∈ independent /
    left_side / right_side / mid_side (2ch only). ``lpc`` forces LPC
    subframes with the given (quantized coefs, precision, shift) —
    residuals are computed with the decoder's exact integer formula, so
    ANY in-range coefficients round-trip. ``escape_raw_bits`` forces
    every rice partition to the escape-to-raw path."""
    nch = len(channels)
    n = len(channels[0])
    assert n > 0 and all(len(c) == n for c in channels)
    assert 1 <= nch <= 8 and 4 <= bps <= 32

    out = bytearray(b"fLaC")
    # STREAMINFO (last-metadata flag set unless a PADDING block follows)
    si = bytearray()
    si += struct.pack(">HH", blocksize, blocksize)
    si += b"\x00\x00\x00" * 2  # min/max framesize unknown
    bits = (rate << 44) | ((nch - 1) << 41) | ((bps - 1) << 36) | n
    si += bits.to_bytes(8, "big")
    if write_md5 and bps % 8 == 0:
        width = bps // 8
        mask = (1 << bps) - 1
        h = hashlib.md5()
        buf = bytearray()
        for i in range(n):
            for c in channels:
                buf += (c[i] & mask).to_bytes(width, "little")
        h.update(bytes(buf))
        si += h.digest()
    else:
        si += b"\x00" * 16
    out.append((0x00 if padding_block else 0x80) | 0)
    out += len(si).to_bytes(3, "big")
    out += si
    if padding_block:
        out.append(0x80 | 1)  # last-flag + PADDING
        out += (4).to_bytes(3, "big")
        out += b"\x00" * 4

    frame_idx = 0
    start = 0
    while start < n:
        this_bs = min(blocksize, n - start)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(1 if variable_blocking else 0, 1)
        # block size: use the table code when it matches, else 16-bit-1
        bs_code = next(
            (c for c, v in _BLOCKSIZE_CODES.items() if v == this_bs), None
        )
        bw.write(bs_code if bs_code is not None else 7, 4)
        sr_code = next(
            (c for c, v in _SAMPLE_RATE_CODES.items() if v == rate), None
        )
        if sr_code is None:
            sr_code = 0xD if rate < 65536 else 0
        bw.write(sr_code, 4)
        if nch == 2 and stereo_mode != "independent":
            ch_code = {"left_side": 8, "right_side": 9, "mid_side": 10}[
                stereo_mode
            ]
        else:
            ch_code = nch - 1
        bw.write(ch_code, 4)
        ss_code = next(
            (c for c, v in _SAMPLE_SIZE_CODES.items() if v == bps), 0
        )
        bw.write(ss_code, 3)
        bw.write(0, 1)
        _write_coded_number(bw, start if variable_blocking else frame_idx)
        if bs_code is None:
            bw.write(this_bs - 1, 16)
        if sr_code == 0xD:
            bw.write(rate, 16)
        bw.align()
        hdr = bw.bytes()
        bw = _BitWriter()
        for b in hdr:
            bw.write(b, 8)
        bw.write(_crc8(hdr), 8)

        block = [c[start : start + this_bs] for c in channels]
        if ch_code == 8:
            subs = [(block[0], bps), (
                [l - r for l, r in zip(block[0], block[1])], bps + 1)]
        elif ch_code == 9:
            subs = [(
                [l - r for l, r in zip(block[0], block[1])], bps + 1),
                (block[1], bps)]
        elif ch_code == 10:
            subs = [(
                [(l + r) >> 1 for l, r in zip(block[0], block[1])], bps),
                ([l - r for l, r in zip(block[0], block[1])], bps + 1)]
        else:
            subs = [(b, bps) for b in block]
        for samples, sub_bps in subs:
            _encode_subframe(bw, samples, sub_bps, lpc, part_order,
                             escape_raw_bits, verbatim)
        bw.align()
        body = bw.bytes()
        out += body
        out += _crc16(body).to_bytes(2, "big")
        start += this_bs
        frame_idx += 1
    return bytes(out)
