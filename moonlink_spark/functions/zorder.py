"""Space-filling-curve keys: Z-order (bit interleave) and Hilbert.

Moonlink has NO clustering (its compactor concatenates batches in input
order, compactor.rs:242-284); the north rule adds it. Both curves are
public-knowledge constructions: Morton codes via bit interleaving, and
Hilbert indices via John Skilling's transpose algorithm ("Programming the
Hilbert curve", AIP Conf. Proc. 707, 2004 — public domain pseudocode).

Everything is vectorized numpy over uint64 arrays; the Spark surface is a
single Arrow-batched pandas UDF (no per-row Python).
"""

from __future__ import annotations

import numpy as np

DEFAULT_BITS = 16  # 16 bits/dim x 3 dims = 48-bit keys, fits LongType


def normalize_to_bits(
    x: np.ndarray, lo: float, hi: float, bits: int = DEFAULT_BITS
) -> np.ndarray:
    """Affine-map values into [0, 2^bits) as uint64 (nulls -> 0)."""
    x = np.asarray(x, dtype=np.float64)
    span = hi - lo
    if span <= 0:
        return np.zeros(len(x), dtype=np.uint64)
    maxv = (1 << bits) - 1
    scaled = np.clip((x - lo) / span, 0.0, 1.0) * maxv
    # round-to-nearest, not truncate: integer inputs at exact bounds must
    # round-trip exactly (x/maxv*maxv can land at x−ulp, truncating to x−1)
    out = np.rint(np.nan_to_num(scaled, nan=0.0)).astype(np.uint64)
    return out


def interleave_bits(cols: list[np.ndarray], bits: int = DEFAULT_BITS) -> np.ndarray:
    """Morton/Z-order code: bit b of dim d -> bit b*ndims+d of the key."""
    ndims = len(cols)
    out = np.zeros(len(cols[0]), dtype=np.uint64)
    for b in range(bits):
        for d, c in enumerate(cols):
            out |= ((c >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * ndims + d)
    return out.astype(np.int64)


def hilbert_index(cols: list[np.ndarray], bits: int = DEFAULT_BITS) -> np.ndarray:
    """D-dimensional Hilbert index (Skilling's AxesToTranspose, vectorized)."""
    ndims = len(cols)
    X = np.stack([c.astype(np.uint64) for c in cols], axis=1)  # (n, ndims)
    n = X.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    M = np.uint64(1 << (bits - 1))

    # inverse undo
    Q = M
    one = np.uint64(1)
    while Q > one:
        P = Q - one
        for i in range(ndims):
            hit = (X[:, i] & Q) != 0
            X[hit, 0] ^= P
            t = (X[~hit, 0] ^ X[~hit, i]) & P
            X[~hit, 0] ^= t
            X[~hit, i] ^= t
        Q >>= one

    # Gray encode
    for i in range(1, ndims):
        X[:, i] ^= X[:, i - 1]
    t = np.zeros(n, dtype=np.uint64)
    Q = M
    while Q > one:
        hit = (X[:, ndims - 1] & Q) != 0
        t[hit] ^= Q - one
        Q >>= one
    for i in range(ndims):
        X[:, i] ^= t

    # transpose -> scalar index, MSB first
    out = np.zeros(n, dtype=np.uint64)
    for j in range(bits):
        for i in range(ndims):
            out = (out << one) | ((X[:, i] >> np.uint64(bits - 1 - j)) & one)
    return out.astype(np.int64)


def curve_key(
    arrays: list[np.ndarray],
    bounds: list[tuple[float, float]],
    curve: str = "zorder",
    bits: int = DEFAULT_BITS,
) -> np.ndarray:
    normed = [normalize_to_bits(a, lo, hi, bits) for a, (lo, hi) in zip(arrays, bounds)]
    if curve == "zorder":
        return interleave_bits(normed, bits)
    if curve == "hilbert":
        return hilbert_index(normed, bits)
    raise ValueError(f"unknown curve {curve!r}")


def _spread_stages(ndims: int, bits: int) -> list[tuple[int, int]]:
    """(mask, shift) stages that move bit b of a < 2^bits value to bit
    b*ndims, in O(log bits) masked shifts (the generalized Morton
    "magic bits" spread, derived for any stride instead of hard-coded
    2D/3D mask tables).

    Stage j (processed high→low) moves every bit whose source index has
    bit j set left by 2^j*(ndims-1); before stage j, source bit i sits at
    (i & ~M)*ndims + (i & M) with M = 2^(j+1)-1, which gives the mask of
    current positions to move."""
    stages: list[tuple[int, int]] = []
    if ndims <= 1:
        return stages
    nstages = max(1, (bits - 1).bit_length())
    for j in range(nstages - 1, -1, -1):
        m_low = (1 << (j + 1)) - 1
        mask = 0
        for i in range(bits):
            if i & (1 << j):
                mask |= 1 << ((i & ~m_low) * ndims + (i & m_low))
        if mask:
            stages.append((mask, (1 << j) * (ndims - 1)))
    return stages


def _quantize_column(c, lo: float, hi: float, bits: int):
    """Quantized cell index of *c* as a long Column (HALF_EVEN bround,
    NaN→0 — exactly normalize_to_bits)."""
    from pyspark.sql import Column, functions as F

    c = c if isinstance(c, Column) else F.col(c)
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    maxv = float((1 << bits) - 1)
    cd = c.cast("double")
    cd = F.when(F.isnan(cd), F.lit(None).cast("double")).otherwise(cd)
    scaled = (
        F.least(
            F.greatest((cd - F.lit(float(lo))) / F.lit(span), F.lit(0.0)),
            F.lit(1.0),
        )
        * F.lit(maxv)
    )
    return F.coalesce(F.bround(scaled, 0), F.lit(0.0)).cast("long")


def with_zorder_key(
    df,
    by: list[str],
    bounds: list[tuple[float, float]],
    bits: int = DEFAULT_BITS,
    out: str = "_zkey",
):
    """Attach the Z-order key of *by* to *df* as column *out* — the hot-path
    form of ``zorder_key_column``.

    Each spread stage lands in its OWN projection level (withColumns):
    every stage references its input twice, so composing them as one
    Column would copy the whole subtree at each reference (2^stages
    textual blowup — the Catalyst optimizer's CollapseProject specifically
    refuses to inline non-cheap aliases referenced more than once, which
    is exactly the guarantee keeping these levels separate). Result: an
    O(log bits)-deep plan whose analysis, codegen and per-row cost all
    stay proportional to the written expression, with keys bit-identical
    to ``curve_key(..., "zorder")``."""
    from pyspark.sql import functions as F

    ndims = len(by)
    qnames = [f"_zq{d}" for d in range(ndims)]
    df = df.withColumns(
        {
            qn: _quantize_column(F.col(c), lo, hi, bits)
            for qn, c, (lo, hi) in zip(qnames, by, bounds)
        }
    )
    for mask, shift in _spread_stages(ndims, bits):
        df = df.withColumns(
            {
                qn: F.col(qn)
                .bitwiseAND(F.lit(~mask))
                .bitwiseOR(F.shiftleft(F.col(qn).bitwiseAND(F.lit(mask)), shift))
                for qn in qnames
            }
        )
    key = None
    for d, qn in enumerate(qnames):
        placed = F.shiftleft(F.col(qn), d) if d else F.col(qn)
        key = placed if key is None else key.bitwiseOR(placed)
    if key is None:
        key = F.lit(0).cast("long")
    return df.withColumn(out, key).drop(*qnames)


def zorder_key_column(cols, bounds: list[tuple[float, float]], bits: int = DEFAULT_BITS):
    """The Z-order key as a NATIVE Spark Column — bit-for-bit identical to
    ``curve_key(..., curve="zorder")`` but whole-stage-codegen'd JVM-side, so
    the clustering hot path never round-trips rows through Python workers.

    The interleave is O(log bits) masked shifts per dimension (staged
    Morton spread) rather than one term per (bit, dim): for 3×16 bits that
    is ~15 integer ops instead of a 48-term nested chain, which cuts the
    expression-tree build, the per-plan Janino codegen (clustering plans
    embed fresh literals, so every run recompiles), and the per-row cost.

    Exactness: ``F.bround`` is HALF_EVEN like ``np.rint``; both paths do the
    same float64 arithmetic, so quantized cells (and therefore keys) match.
    Hilbert has no SQL form (iterative state transform) and stays on the
    vectorized-numpy pandas UDF.
    """
    from pyspark.sql import functions as F

    ndims = len(cols)
    # NaN handling inside _quantize_column: NaN -> null -> quantized 0,
    # matching normalize_to_bits (numpy maps NaN to cell 0); without this,
    # Spark's greatest/least order NaN as LARGEST and a NaN input would
    # quantize to maxv — divergent keys
    qs = [_quantize_column(c, lo, hi, bits) for c, (lo, hi) in zip(cols, bounds)]
    stages = _spread_stages(ndims, bits)
    key = None
    for d, q in enumerate(qs):
        x = q
        for mask, shift in stages:
            moved = F.shiftleft(x.bitwiseAND(F.lit(mask)), shift)
            x = x.bitwiseAND(F.lit(~mask)).bitwiseOR(moved)
        placed = F.shiftleft(x, d) if d else x
        key = placed if key is None else key.bitwiseOR(placed)
    return key if key is not None else F.lit(0).cast("long")
