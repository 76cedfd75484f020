"""Curve-kernel unit tests: Morton golden values, Hilbert bijectivity +
adjacency, normalization round-trip (SURVEY.md §5 translation: operator
unit tests with golden checks)."""

import numpy as np

from moonlink_spark.functions.zorder import (
    curve_key,
    hilbert_index,
    interleave_bits,
    normalize_to_bits,
)


def test_morton_golden():
    # bit b of dim d -> bit b*ndims+d
    x = np.array([0b11, 0b00, 0b01], dtype=np.uint64)
    y = np.array([0b00, 0b11, 0b10], dtype=np.uint64)
    out = interleave_bits([x, y], bits=2)
    # (x=3,y=0) -> bits x0,y0,x1,y1 = 1,0,1,0 -> 0b0101 = 5
    # (x=0,y=3) -> 0b1010 = 10 ; (x=1,y=2) -> x0=1,y0=0,x1=0,y1=1 -> 0b1001=9
    assert out.tolist() == [5, 10, 9]


def test_morton_3d_golden():
    x = np.array([1], dtype=np.uint64)
    y = np.array([1], dtype=np.uint64)
    z = np.array([1], dtype=np.uint64)
    assert interleave_bits([x, y, z], bits=1).tolist() == [7]


def test_normalize_roundtrip_exact():
    # integers at exact power-of-two bounds must round-trip exactly
    x = np.arange(0, 65536, 97, dtype=np.int64)
    out = normalize_to_bits(x, 0.0, 65535.0, bits=16)
    assert np.array_equal(out, x.astype(np.uint64))


def test_hilbert_bijective_2d():
    bits = 3
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
    idx = hilbert_index([xs.ravel(), ys.ravel()], bits=bits)
    assert sorted(idx.tolist()) == list(range(n * n))


def test_hilbert_adjacency_2d():
    """Consecutive Hilbert indices must be grid neighbors (the defining
    locality property a Z-order curve lacks)."""
    bits = 3
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint64), np.arange(n, dtype=np.uint64))
    fx, fy = xs.ravel(), ys.ravel()
    idx = hilbert_index([fx, fy], bits=bits)
    order = np.argsort(idx)
    dx = np.abs(np.diff(fx[order].astype(np.int64)))
    dy = np.abs(np.diff(fy[order].astype(np.int64)))
    assert np.all(dx + dy == 1)


def test_hilbert_bijective_3d():
    bits = 2
    n = 1 << bits
    g = np.arange(n, dtype=np.uint64)
    xs, ys, zs = np.meshgrid(g, g, g)
    idx = hilbert_index([xs.ravel(), ys.ravel(), zs.ravel()], bits=bits)
    assert sorted(idx.tolist()) == list(range(n ** 3))
    # adjacency in 3D as well
    fx, fy, fz = xs.ravel(), ys.ravel(), zs.ravel()
    order = np.argsort(idx)
    d = (
        np.abs(np.diff(fx[order].astype(np.int64)))
        + np.abs(np.diff(fy[order].astype(np.int64)))
        + np.abs(np.diff(fz[order].astype(np.int64)))
    )
    assert np.all(d == 1)


def test_curve_key_dispatch():
    arrays = [np.array([1.0, 2.0]), np.array([3.0, 4.0])]
    bounds = [(0.0, 10.0), (0.0, 10.0)]
    z = curve_key(arrays, bounds, curve="zorder", bits=8)
    h = curve_key(arrays, bounds, curve="hilbert", bits=8)
    assert z.dtype == np.int64 and h.dtype == np.int64 and len(z) == len(h) == 2


def test_sql_zorder_matches_numpy(spark):
    """The native-SQL Z-order column (clustering hot path) must be bit-exact
    vs the numpy kernel on random inputs including nulls."""
    import pandas as pd
    from pyspark.sql import functions as F

    from moonlink_spark.functions.zorder import zorder_key_column

    rng = np.random.Generator(np.random.PCG64(11))
    n = 20000
    x = rng.integers(-(2**40), 2**40, n).astype("float64")
    y = rng.integers(0, 65536, n).astype("float64")
    z = rng.integers(16, 65, n).astype("float64")
    x[::97] = np.nan  # null dims quantize to 0 in both paths
    bounds = [(float(np.nanmin(x)), float(np.nanmax(x))), (0.0, 65535.0), (16.0, 64.0)]
    pdf = pd.DataFrame({"i": np.arange(n), "x": x, "y": y, "z": z})
    df = spark.createDataFrame(pdf)
    col = zorder_key_column([F.col("x"), F.col("y"), F.col("z")], bounds, bits=16)
    got_rows = df.select("i", col.alias("k")).collect()
    got = np.empty(n, dtype=np.int64)
    for r in got_rows:
        got[r["i"]] = r["k"]
    want = curve_key([x, y, z], bounds, curve="zorder", bits=16)
    assert np.array_equal(got, want)


def test_sql_zorder_nan_parity(spark):
    """TRUE NaN doubles (not null): Spark's greatest/least order NaN as
    largest, so without the explicit NaN->null guard the SQL path would
    quantize NaN to maxv while numpy maps it to cell 0. Both paths must
    agree on cell 0."""
    from pyspark.sql import functions as F

    from moonlink_spark.functions.zorder import zorder_key_column

    df = spark.sql("""
        SELECT id,
               CASE WHEN id % 3 = 0 THEN double('NaN') ELSE CAST(id AS DOUBLE) END AS x,
               CAST(id * 7 % 100 AS DOUBLE) AS y
        FROM range(300)
    """)
    bounds = [(0.0, 299.0), (0.0, 99.0)]
    col = zorder_key_column([F.col("x"), F.col("y")], bounds, bits=16)
    got = {r["id"]: r["k"] for r in df.select("id", col.alias("k")).collect()}

    x = np.array([np.nan if i % 3 == 0 else float(i) for i in range(300)])
    y = np.array([float(i * 7 % 100) for i in range(300)])
    want = curve_key([x, y], bounds, curve="zorder", bits=16)
    assert all(got[i] == want[i] for i in range(300))


def test_with_zorder_key_matches_numpy(spark):
    """The projection-staged hot-path form (with_zorder_key) must be
    bit-exact vs the numpy kernel — incl. NaN — and vs zorder_key_column,
    for 2 and 3 dims."""
    import pandas as pd

    from moonlink_spark.functions.zorder import with_zorder_key

    rng = np.random.Generator(np.random.PCG64(23))
    n = 10000
    x = rng.uniform(-5.0, 70005.0, n)
    y = rng.integers(0, 100, n).astype("float64")
    z = rng.integers(0, 7, n).astype("float64")
    x[::97] = np.nan
    for dims in (2, 3):
        arrays = [x, y, z][:dims]
        names = ["x", "y", "z"][:dims]
        bounds = [(0.0, 65535.0), (0.0, 99.0), (0.0, 6.0)][:dims]
        pdf = pd.DataFrame({"i": np.arange(n), **dict(zip(names, arrays))})
        out = with_zorder_key(spark.createDataFrame(pdf), names, bounds, bits=16)
        got_rows = out.select("i", "_zkey").collect()
        got = np.empty(n, dtype=np.int64)
        for r in got_rows:
            got[r["i"]] = r["_zkey"]
        want = curve_key(arrays, bounds, curve="zorder", bits=16)
        assert np.array_equal(got, want), dims
        assert "_zq0" not in out.columns
