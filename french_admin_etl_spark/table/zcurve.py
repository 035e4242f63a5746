"""Morton-curve interval mathematics for z-ordered file pruning.

``optimize_zorder`` lays each bucket out along a Z (Morton) curve and
records, per file, the curve interval ``[zmin, zmax]`` it covers. A
multi-dimensional box query then needs one driver-side question per
file: *does this curve interval ever enter the query box?* Per-dimension
min/max stats answer a strictly weaker question — a contiguous curve
segment can sweep a wide bounding rectangle while never entering the
box (the curve's characteristic staircase jumps), so per-dimension
overlap keeps files the curve test provably excludes.

The interval/box intersection uses the classic BIGMIN computation
(Tropf & Herzog, "Multidimensional Range Search in Dynamically Balanced
Trees", 1981 — the same algorithm behind UB-tree range scans and modern
z-order readers): walking the interleaved bits from the most significant,
it either proves the interval's lower end already lies in the box or
computes the smallest curve address above it that does; the interval
intersects the box iff that address is ≤ the interval's upper end.

Everything here is pure-Python integer math over the driver-side
manifest — no Spark, no I/O; files are pruned before any task is
scheduled. Bit layout must match ``optimize_zorder``: rank-bit ``i`` of
column ``j`` sits at position ``i * ncols + j``.

Reference parity: none (the reference delegates layout to Postgres
heaps/btrees); this extends the engine's own table format the way Delta
OPTIMIZE ZORDER + file skipping does, with the curve-exact test modern
readers usually skip.
"""

from __future__ import annotations

from bisect import bisect_right


def rank_of(value: float, bounds: list[float]) -> int:
    """Equi-depth rank of ``value``: count of boundaries ≤ value — the
    driver-side mirror of the write path's ``size(filter(bounds ≤ v))``
    expression (``bisect_right`` computes exactly that on a sorted
    list)."""
    return bisect_right(bounds, value)


def encode(ranks: list[int], ncols: int, bits: int) -> int:
    """Interleave per-column ranks into a curve address (column ``j``'s
    bit ``i`` at position ``i * ncols + j``)."""
    z = 0
    for j, r in enumerate(ranks):
        for i in range(bits):
            z |= ((r >> i) & 1) << (i * ncols + j)
    return z


def decode(z: int, ncols: int, bits: int) -> list[int]:
    ranks = [0] * ncols
    for j in range(ncols):
        for i in range(bits):
            ranks[j] |= ((z >> (i * ncols + j)) & 1) << i
    return ranks


def _load(z: int, pos: int, bit_is_one: bool, ncols: int) -> int:
    """BIGMIN's LOAD step: set bit ``pos`` to the given value and force
    all LOWER bits of the SAME dimension to the opposite extreme
    (pattern ``10…0`` / ``01…1``); other dimensions' bits are
    untouched."""
    j = pos % ncols
    i = pos // ncols
    if bit_is_one:
        z |= 1 << pos
        for k in range(i):
            z &= ~(1 << (k * ncols + j))
    else:
        z &= ~(1 << pos)
        for k in range(i):
            z |= 1 << (k * ncols + j)
    return z


def bigmin(z: int, zmin: int, zmax: int, ncols: int, bits: int) -> int | None:
    """Smallest curve address > ``z`` that decodes INTO the box whose
    corner addresses are ``zmin``/``zmax`` — or None when no box address
    exceeds ``z``. Precondition: ``z`` itself is NOT in the box (callers
    test that first with :func:`decode`)."""
    bm: int | None = None
    for pos in range(ncols * bits - 1, -1, -1):
        zb = (z >> pos) & 1
        nb = (zmin >> pos) & 1
        xb = (zmax >> pos) & 1
        if zb == 0 and nb == 0 and xb == 0:
            continue
        if zb == 0 and nb == 0 and xb == 1:
            bm = _load(zmin, pos, True, ncols)
            zmax = _load(zmax, pos, False, ncols)
        elif zb == 0 and nb == 1 and xb == 1:
            return zmin
        elif zb == 1 and nb == 0 and xb == 0:
            return bm
        elif zb == 1 and nb == 0 and xb == 1:
            zmin = _load(zmin, pos, True, ncols)
        elif zb == 1 and nb == 1 and xb == 1:
            continue
        else:  # nb=1, xb=0: the box corner codes disagree — invalid box
            raise ValueError("invalid box: zmin bit above zmax bit")
    return bm


def interval_intersects_box(
    zlo: int,
    zhi: int,
    rank_lo: list[int],
    rank_hi: list[int],
    ncols: int,
    bits: int,
) -> bool:
    """Does the curve interval ``[zlo, zhi]`` contain any address whose
    decoded ranks satisfy ``rank_lo[j] ≤ rank[j] ≤ rank_hi[j]`` for every
    dimension? False means the file provably holds no row of the query
    box and can be pruned."""
    pt = decode(zlo, ncols, bits)
    if all(lo <= p <= hi for p, lo, hi in zip(pt, rank_lo, rank_hi)):
        return True
    zmin = encode(rank_lo, ncols, bits)
    zmax = encode(rank_hi, ncols, bits)
    if zlo > zmax or zhi < zmin:
        return False
    nxt = bigmin(zlo, zmin, zmax, ncols, bits)
    return nxt is not None and nxt <= zhi
