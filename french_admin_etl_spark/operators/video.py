"""Real video frame iteration for library-free containers — no ffmpeg.

Two raw-frame container formats are fully parseable with stdlib + numpy,
and they are the standard interchange formats for UNCOMPRESSED video
(what ffmpeg itself emits with ``-f yuv4mpegpipe`` / ``-c:v rawvideo``):

- **Y4M (YUV4MPEG2)**: a text header (``W<width> H<height> F<rate>
  C<chroma>``) followed by ``FRAME`` records of planar YCbCr. The luma
  plane is the BT.601 gray directly. Chroma subsampling tags C420*,
  C422, C444 and Cmono are supported (chroma planes are skipped — the
  gray pipeline needs only Y).
- **Uncompressed AVI** (RIFF ``AVI `` with ``BI_RGB`` 24-bit frames):
  chunk-walk ``hdrl`` for the BITMAPINFOHEADER, then iterate the
  ``movi`` list's ``..db``/``..dc`` chunks — each is one bottom-up,
  4-byte-row-padded BGR frame (same pixel layout as BMP, which
  ``multimodal.decode_image`` already decodes).

**MJPEG AVI** (``biCompression == 'MJPG'``) decodes too (round 5):
each movi chunk is a standalone JPEG handed to the in-house T.81
decoder, so the only compressed-video codec that needs no external
library is real. **Animated GIF** iterates as a video too (round 5):
frames composite onto the logical-screen canvas with disposal,
transparency, local palettes, and sub-rectangle deltas — the GIF89a
animation model in full. Other compressed codecs inside AVI raise
``NotImplementedError`` — the honest ffmpeg seam, dead-lettered per row
by the caller (S9). Frames are yielded lazily so sampling every Nth
frame of a long clip never materializes the rest.

Reference: the reference engine has no media path at all (it ingests
INSEE CSV/GeoJSON only, ``cmd/main.go`` + ``internal/processor``); this extends the engine's
binary-column story for multimodal training data.
"""

from __future__ import annotations

import numpy as np

def _chroma_bytes(chroma: str, w: int, h: int) -> int | None:
    """Bytes of BOTH chroma planes for one frame. Computed with CEILING
    division per plane — ``int(ysize * factor)`` was wrong for odd
    dimensions (a 3x3 C420 frame has 2x ceil(3/2)*ceil(3/2) = 8 chroma
    bytes, not int(9*0.5) = 4), drifting every frame's read position and
    rejecting valid odd-dimension clips as corrupt (review finding;
    ffmpeg emits ceil-sized planes). Returns None for unsupported tags."""
    if chroma in ("420", "420jpeg", "420mpeg2", "420paldv"):
        return 2 * ((w + 1) // 2) * ((h + 1) // 2)
    if chroma == "422":
        return 2 * ((w + 1) // 2) * h
    if chroma == "444":
        return 2 * w * h
    if chroma == "mono":
        return 0
    return None


def _iter_y4m(payload: bytes):
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    w = h = None
    chroma = "420"
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:].decode("ascii")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise ValueError(f"Y4M dimensions {w}x{h} exceed the decoder cap")
    csize = _chroma_bytes(chroma, w, h)
    if csize is None:
        raise NotImplementedError(f"Y4M chroma mode C{chroma}")
    ysize = w * h
    pos = nl + 1
    idx = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"Y4M frame {idx}: bad FRAME marker")
        fnl = payload.index(b"\n", pos)  # frame params (if any) run to \n
        pos = fnl + 1
        if pos + ysize + csize > n:
            raise ValueError(f"Y4M frame {idx}: truncated")
        yplane = (
            np.frombuffer(payload, np.uint8, count=ysize, offset=pos)
            .reshape(h, w)
            .astype(np.float64)
        )
        pos += ysize + csize
        yield idx, w, h, yplane
        idx += 1


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, data_start, data_size) walking a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        yield fourcc, pos + 8, size
        pos += 8 + size + (size & 1)  # chunks pad to even


def _iter_avi(payload: bytes):
    if payload[8:12] != b"AVI ":
        raise ValueError("RIFF file is not AVI")
    strf = None
    movi = None
    for fourcc, start, size in _riff_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST":
            continue
        kind = payload[start : start + 4]
        if kind == b"hdrl":
            # find the VIDEO stream's strf (BITMAPINFOHEADER): stream
            # order is unconstrained, so an audio-first AVI's
            # WAVEFORMATEX must not be misread as video dimensions
            # (review finding) — select the strl whose strh fccType is
            # 'vids'
            for f2, s2, z2 in _riff_chunks(payload, start + 4, start + size):
                if f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                    is_video = False
                    for f3, s3, z3 in _riff_chunks(payload, s2 + 4, s2 + z2):
                        if f3 == b"strh":
                            is_video = payload[s3 : s3 + 4] == b"vids"
                        elif f3 == b"strf" and is_video:
                            strf = payload[s3 : s3 + z3]
                            break
                if strf:
                    break
        elif kind == b"movi":
            movi = (start + 4, start + size)
    if strf is None or movi is None:
        raise ValueError("AVI missing strf header or movi list")
    w = int.from_bytes(strf[4:8], "little", signed=True)
    h = int.from_bytes(strf[8:12], "little", signed=True)
    bpp = int.from_bytes(strf[14:16], "little")
    compression = int.from_bytes(strf[16:20], "little")
    # MJPEG (biCompression fourcc 'MJPG'): every movi chunk is one
    # standalone JPEG — the in-house T.81 decoder handles it (round 5).
    # Frames must carry their own DHT (as compliant encoders emit); the
    # OpenDML no-DHT shorthand that assumes annex-K default tables is
    # not filled in.
    mjpeg = strf[16:20] in (b"MJPG", b"mjpg", b"dmb1")
    if not mjpeg and (compression != 0 or bpp != 24):
        raise NotImplementedError(
            f"AVI codec biCompression={compression} bpp={bpp} needs ffmpeg"
        )
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h <= 0 or w * h > 1 << 28:
        raise ValueError(f"AVI dimensions {w}x{h} exceed the decoder cap")
    stride = (w * 3 + 3) & ~3
    idx = 0

    def movi_chunks(pos, end):
        # interleaved AVIs (CD-ROM pacing) wrap frame chunks in LIST
        # 'rec ' sublists — skipping them yielded ZERO frames for a
        # fully valid video with no error (review finding); recurse
        for fourcc, start, size in _riff_chunks(payload, pos, end):
            if fourcc == b"LIST" and payload[start : start + 4] == b"rec ":
                yield from movi_chunks(start + 4, start + size)
            else:
                yield fourcc, start, size

    for fourcc, start, size in movi_chunks(movi[0], movi[1]):
        if fourcc[2:4] not in (b"db", b"dc"):
            continue  # index/audio chunks
        if mjpeg:
            from .jpeg import decode_jpeg_gray

            fw, fh, gray = decode_jpeg_gray(bytes(payload[start : start + size]))
            yield idx, fw, fh, gray
            idx += 1
            continue
        if size < stride * h:
            raise ValueError(f"AVI frame {idx}: truncated")
        rows = np.frombuffer(payload, np.uint8, count=stride * h, offset=start)
        bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3).astype(np.float64)
        if bottom_up:
            bgr = bgr[::-1]
        gray = 0.299 * bgr[:, :, 2] + 0.587 * bgr[:, :, 1] + 0.114 * bgr[:, :, 0]
        yield idx, w, h, gray
        idx += 1


def _iter_gif(payload: bytes):
    """Animated-GIF frame iteration (round 5): composites every image
    block onto the logical-screen canvas per the GIF89a animation model —
    graphic-control DISPOSAL (0/1 leave, 2 restore-to-background, 3
    restore-to-previous), TRANSPARENCY (transparent pixels leave the
    canvas untouched — that's how animation deltas work), per-frame
    local palettes, sub-rectangle frames, interlace — and yields the
    full composed canvas per frame as BT.601 gray.
    ``multimodal.decode_image``'s GIF branch stays first-frame-only (the
    still-image feature); this is the video-shaped view of the same
    container, so Nth-frame sampling works on animation too."""
    # lazy import: multimodal imports this module's decode_video_frames
    from .multimodal import _gif_read_frame

    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    packed = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    bg = (
        gct[bg_idx].astype(np.float64)
        if gct is not None and bg_idx < len(gct)
        else np.zeros(3)
    )
    canvas = np.tile(bg, (sh, sw, 1))
    trans_idx: int | None = None
    disposal = 0
    frame_i = 0
    try:
        while pos < len(payload):
            b = payload[pos]
            if b == 0x3B:  # trailer
                return
            if b == 0x21:  # extension
                label = payload[pos + 1]
                pos += 2
                if label == 0xF9 and payload[pos] >= 4:
                    gp = payload[pos + 1]
                    disposal = (gp >> 2) & 7
                    trans_idx = payload[pos + 4] if (gp & 1) else None
                while payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
                continue
            if b != 0x2C:
                raise ValueError(f"bad GIF block introducer 0x{b:02x}")
            left, top, w, h, ct, rows, pos = _gif_read_frame(payload, pos, gct, np)
            if left + w > sw or top + h > sh:
                raise ValueError("GIF frame rectangle outside the logical screen")
            prev_region = canvas[top : top + h, left : left + w].copy() if disposal == 3 else None
            region = canvas[top : top + h, left : left + w]
            rgb = ct[rows].astype(np.float64)
            if trans_idx is not None:
                mask = rows != trans_idx
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            gray = (
                0.299 * canvas[:, :, 0]
                + 0.587 * canvas[:, :, 1]
                + 0.114 * canvas[:, :, 2]
            )
            yield frame_i, sw, sh, gray
            frame_i += 1
            if disposal == 2:
                canvas[top : top + h, left : left + w] = bg
            elif disposal == 3 and prev_region is not None:
                canvas[top : top + h, left : left + w] = prev_region
            disposal = 0
            trans_idx = None
        raise ValueError("truncated GIF: missing trailer")
    except IndexError:
        raise ValueError("truncated GIF") from None


def _iter_apng(payload: bytes):
    """APNG frame iteration (round 5): composites every frame onto the
    logical-screen canvas per the APNG spec (PNG third edition §4.6 /
    the original Mozilla spec) — ``fcTL`` sub-rectangles, ``dispose_op``
    0/1/2 (none / clear-to-transparent / restore-previous), ``blend_op``
    0/1 (source / alpha-over), strict shared fcTL+fdAT sequence numbers,
    each frame its own zlib stream decoded through the SAME raster core
    as the still decoder (``multimodal._png_raster``). The canvas starts
    fully transparent and frames yield as BT.601 gray of the composited
    canvas with alpha multiplied through (composite over black) —
    consistent with the gray contract; palette/gray/RGB frames are
    opaque (tRNS is ignored, as in the still path). A PNG WITHOUT an
    ``acTL`` chunk yields its still image as one frame (same convention
    as a non-animated GIF87a through ``_iter_gif``)."""
    import struct

    from .multimodal import _decode_png, _png_chunk_iter, _png_raster

    ihdr = plte = actl = None
    frames: list[list] = []  # [fctl tuple, [zlib parts]] in play order
    idat_parts: list[bytes] = []
    idat_fctl = None
    idat_seen = False
    seq_next = 0
    for typ, data in _png_chunk_iter(payload):
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"acTL":
            actl = data
        elif typ == b"fcTL":
            if len(data) < 26:
                raise ValueError("APNG fcTL chunk too short")
            seq = int.from_bytes(data[0:4], "big")
            if seq != seq_next:
                raise ValueError(f"APNG sequence gap: fcTL {seq} != {seq_next}")
            seq_next += 1
            f = struct.unpack(">IIIIHHBB", data[4:26])
            if not idat_seen:
                if idat_fctl is not None:
                    raise ValueError("APNG: two fcTL chunks before IDAT")
                idat_fctl = f  # the IDAT image IS frame 0
            else:
                frames.append([f, []])
        elif typ == b"fdAT":
            if len(data) < 4:
                raise ValueError("APNG fdAT chunk too short")
            seq = int.from_bytes(data[0:4], "big")
            if seq != seq_next:
                raise ValueError(f"APNG sequence gap: fdAT {seq} != {seq_next}")
            seq_next += 1
            if not frames:
                raise ValueError("APNG fdAT before its fcTL")
            frames[-1][1].append(data[4:])
        elif typ == b"IDAT":
            idat_seen = True
            idat_parts.append(data)
    if actl is None:
        w, h, gray = _decode_png(payload)  # plain PNG: one still frame
        yield 0, w, h, gray
        return
    if ihdr is None or not idat_seen:
        raise ValueError("malformed APNG: missing IHDR/IDAT")
    sw = int.from_bytes(ihdr[0:4], "big")
    sh = int.from_bytes(ihdr[4:8], "big")
    if sw <= 0 or sh <= 0 or sw * sh > 1 << 28:
        raise ValueError(f"APNG dimensions {sw}x{sh} exceed the decoder cap")
    depth, ctype, _comp, _filt, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    legal_depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(ctype, (8, 16))
    if channels is None or depth not in legal_depths or interlace > 1:
        raise NotImplementedError(
            f"APNG depth={depth} colortype={ctype} interlace={interlace}"
        )
    pal = None
    if ctype == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("malformed APNG: palette image missing/bad PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3).astype(np.float64)
    if idat_fctl is not None:
        frames.insert(0, [idat_fctl, idat_parts])
    if not frames:
        # acTL with no fcTL at all (incl. a declared frame count of 0,
        # which the spec forbids): yielding NOTHING would silently drop
        # the media row with neither frames nor an err (review finding)
        raise ValueError("APNG has an acTL but no animation frames")
    n_frames = int.from_bytes(actl[0:4], "big")
    if n_frames != len(frames):
        raise ValueError(
            f"APNG acTL declares {n_frames} frames, stream carries {len(frames)}"
        )
    scale = 255.0 / ((1 << depth) - 1)

    def rgba(img, fh, fw):
        out = np.empty((fh, fw, 4), dtype=np.float64)
        if ctype == 3:
            idx = img[:, :, 0]
            if int(idx.max()) >= pal.shape[0]:
                raise ValueError("malformed APNG: palette index out of range")
            out[:, :, :3] = pal[idx]
            out[:, :, 3] = 255.0
        elif ctype == 0:
            out[:, :, :3] = img[:, :, :1].astype(np.float64) * scale
            out[:, :, 3] = 255.0
        elif ctype == 2:
            out[:, :, :3] = img.astype(np.float64) * scale
            out[:, :, 3] = 255.0
        elif ctype == 4:
            out[:, :, :3] = img[:, :, :1].astype(np.float64) * scale
            out[:, :, 3] = img[:, :, 1].astype(np.float64) * scale
        else:  # 6: RGBA
            out[:, :, :3] = img[:, :, :3].astype(np.float64) * scale
            out[:, :, 3] = img[:, :, 3].astype(np.float64) * scale
        return out

    canvas = np.zeros((sh, sw, 4), dtype=np.float64)  # fully transparent
    for i, (fctl, parts) in enumerate(frames):
        fw, fh, fx, fy, _dnum, _dden, dispose, blend = fctl
        if fw <= 0 or fh <= 0 or fx + fw > sw or fy + fh > sh:
            raise ValueError(f"APNG frame {i} rectangle outside the canvas")
        if i == 0 and idat_fctl is not None and (fw != sw or fh != sh or fx or fy):
            raise ValueError("APNG IDAT frame must cover the full canvas")
        if dispose > 2 or blend > 1:
            raise ValueError(f"APNG frame {i}: bad dispose/blend op")
        if dispose == 2 and i == 0:
            dispose = 1  # spec: PREVIOUS on the first frame acts as BACKGROUND
        img = _png_raster(b"".join(parts), fw, fh, depth, channels, interlace)
        src = rgba(img, fh, fw)
        region = canvas[fy : fy + fh, fx : fx + fw]
        prev = region.copy() if dispose == 2 else None
        if blend == 0:  # SOURCE: replace, alpha included
            region[:] = src
        else:  # OVER: standard straight-alpha src-over
            sa = src[:, :, 3:4] / 255.0
            da = region[:, :, 3:4] / 255.0
            oa = sa + da * (1.0 - sa)
            num = src[:, :, :3] * sa + region[:, :, :3] * da * (1.0 - sa)
            region[:, :, :3] = np.where(oa > 0, num / np.maximum(oa, 1e-12), 0.0)
            region[:, :, 3:4] = oa * 255.0
        lum = (
            0.299 * canvas[:, :, 0]
            + 0.587 * canvas[:, :, 1]
            + 0.114 * canvas[:, :, 2]
        )
        yield i, sw, sh, lum * (canvas[:, :, 3] / 255.0)
        if dispose == 1:
            canvas[fy : fy + fh, fx : fx + fw] = 0.0
        elif dispose == 2:
            canvas[fy : fy + fh, fx : fx + fw] = prev


def decode_video_frames(payload: bytes):
    """Lazily yield (frame_idx, width, height, gray float64 HxW) for a
    library-free container; NotImplementedError marks the ffmpeg seam."""
    if payload[:9] == b"YUV4MPEG2":
        return _iter_y4m(payload)
    if payload[:4] == b"RIFF":
        return _iter_avi(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _iter_gif(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _iter_apng(payload)
    raise NotImplementedError(
        f"video container not decodable without ffmpeg (magic {payload[:4]!r})"
    )
