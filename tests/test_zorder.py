"""Z-order layout (spatial/zorder.py): key parity, geohash conformance,
bbox interval-cover properties, and the thing the module exists for —
parquet min/max file skipping on z-clustered data.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from proj_spark.spatial import zorder as Z

# ---------------------------------------------------------------------------
# scalar / Spark / geohash-spec parity
# ---------------------------------------------------------------------------

B32 = Z.GEOHASH_B32


def ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Independent reference: the classic interval-bisection geohash
    algorithm (public spec), no shared code with the module."""
    lat_i, lon_i = (-90.0, 90.0), (-180.0, 180.0)
    even, bit, ch, out = True, 0, 0, []
    while len(out) < precision:
        if even:
            mid = (lon_i[0] + lon_i[1]) / 2
            if lon >= mid:
                ch, lon_i = (ch << 1) | 1, (mid, lon_i[1])
            else:
                ch, lon_i = ch << 1, (lon_i[0], mid)
        else:
            mid = (lat_i[0] + lat_i[1]) / 2
            if lat >= mid:
                ch, lat_i = (ch << 1) | 1, (mid, lat_i[1])
            else:
                ch, lat_i = ch << 1, (lat_i[0], mid)
        even, bit = not even, bit + 1
        if bit == 5:
            out.append(B32[ch])
            bit, ch = 0, 0
    return "".join(out)


def ref_morton(lon: float, lat: float, bits: int) -> int:
    """Independent reference: per-bit interleave loop."""
    n = 1 << bits
    ix = min(max(int((lon + 180.0) / 360.0 * n), 0), n - 1)
    iy = min(max(int((lat + 90.0) / 180.0 * n), 0), n - 1)
    z = 0
    for k in range(bits):
        z |= ((ix >> k) & 1) << (2 * k + 1)
        z |= ((iy >> k) & 1) << (2 * k)
    return z


def _sample_points(n=2000, seed=3):
    rng = random.Random(seed)
    pts = [(rng.uniform(-180, 180), rng.uniform(-90, 90)) for _ in range(n)]
    # exact corners and axes
    pts += [(-180.0, -90.0), (180.0, 90.0), (0.0, 0.0), (-0.1, 0.1),
            (179.999999, -89.999999)]
    return pts


def test_zorder_key_matches_bit_loop():
    for lon, lat in _sample_points():
        assert Z.zorder_key_int(lon, lat, 16) == ref_morton(lon, lat, 16)


def test_geohash_spec_conformance_spark(spark):
    """Spark expression == the public bisection algorithm, and a few
    well-known published geohash values."""
    pts = _sample_points(400, seed=9)
    df = spark.createDataFrame(pts, "lon double, lat double")
    got = df.select("lon", "lat",
                    Z.geohash(F.col("lon"), F.col("lat"), 5).alias("gh"),
                    Z.geohash(F.col("lon"), F.col("lat"), 6).alias("gh6")
                    ).collect()
    for r in got:
        assert r.gh == ref_geohash(r.lon, r.lat, 5)
        assert r.gh6 == ref_geohash(r.lon, r.lat, 6)
    # published examples: geohash.org canonical test vectors
    ex = spark.createDataFrame(
        [(-5.6, 42.6), (13.361389, 38.115556)], "lon double, lat double"
    ).select(Z.geohash(F.col("lon"), F.col("lat"), 5).alias("g")).collect()
    assert ex[0].g == "ezs42"
    assert ex[1].g == "sqc8b"


def test_zorder_key_spark_matches_scalar(spark):
    pts = _sample_points(400, seed=5)
    df = spark.createDataFrame(pts, "lon double, lat double")
    rows = df.select("lon", "lat",
                     Z.zorder_key(F.col("lon"), F.col("lat"), 16)
                     .alias("z")).collect()
    for r in rows:
        assert r.z == Z.zorder_key_int(r.lon, r.lat, 16)


def test_zorder_key_is_pure_expression(spark):
    df = spark.range(1).select((F.col("id") * 1.0).alias("lon"),
                               (F.col("id") * 1.0).alias("lat"))
    plan = df.select(Z.zorder_key(F.col("lon"), F.col("lat"), 16)) \
             ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# bbox -> interval cover
# ---------------------------------------------------------------------------

def test_bbox_ranges_cover_complete_and_bounded():
    rng = random.Random(17)
    for _ in range(100):
        x0 = rng.uniform(-180, 179)
        x1 = min(180.0, x0 + rng.uniform(0.01, 50))
        y0 = rng.uniform(-90, 89)
        y1 = min(90.0, y0 + rng.uniform(0.01, 40))
        ranges = Z.bbox_ranges(x0, x1, y0, y1, bits=16, max_ranges=32)
        assert 1 <= len(ranges) <= 32
        assert all(lo <= hi for lo, hi in ranges)
        # disjoint + sorted after merge
        for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
            assert a1 + 1 < b0
        # cover: every sampled in-window point's key falls in a range
        for _ in range(25):
            lon, lat = rng.uniform(x0, x1), rng.uniform(y0, y1)
            k = Z.zorder_key_int(lon, lat, 16)
            assert any(lo <= k <= hi for lo, hi in ranges)


def test_bbox_ranges_selective():
    """A city-sized window must not degenerate to a whole-space scan."""
    ranges = Z.bbox_ranges(10.0, 13.0, 50.0, 52.0, bits=16, max_ranges=32)
    covered = sum(hi - lo + 1 for lo, hi in ranges)
    assert covered / float(1 << 32) < 1e-3


def test_bbox_ranges_rejects_empty():
    with pytest.raises(ValueError):
        Z.bbox_ranges(10.0, 9.0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# the payoff: file skipping on z-clustered parquet
# ---------------------------------------------------------------------------

def test_cluster_by_zorder_enables_file_skipping(spark, tmp_path):
    """Write a z-clustered table, then show (a) each parquet file owns
    a tight zkey interval, (b) a bbox's range predicate rules out most
    files by min/max alone, and (c) the pruned scan returns exactly the
    brute-force rows with the zkey BETWEENs in PushedFilters."""
    import pyarrow.parquet as pq

    rng = random.Random(23)
    pts = [(i, rng.uniform(-180, 180), rng.uniform(-60, 60))
           for i in range(20000)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    out = str(tmp_path / "zclustered")
    Z.cluster_by_zorder(df, n_files=16).write.parquet(out)

    # (a) per-file zkey intervals from the parquet footers
    import glob
    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo = min(md.row_group(g).column(idx["zkey"]).statistics.min
                 for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(idx["zkey"]).statistics.max
                 for g in range(md.num_row_groups))
        spans.append((lo, hi))
    assert len(spans) >= 8
    spans.sort()
    # range partitioning: files tile the key space (no gross overlap)
    overlaps = sum(1 for (a0, a1), (b0, b1) in zip(spans, spans[1:])
                   if b0 < a1)
    assert overlaps == 0

    # (b) a city bbox's ranges intersect only a minority of files
    bbox = (10.0, 20.0, 40.0, 50.0)
    ranges = Z.bbox_ranges(*bbox, bits=16, max_ranges=32)
    hit = [s for s in spans
           if any(lo <= s[1] and hi >= s[0] for lo, hi in ranges)]
    assert len(hit) < len(spans) / 2

    # (c) pruned + exact read == brute force; predicate reaches the scan
    zread = spark.read.parquet(out)
    pred = Z.ranges_predicate(F.col("zkey"), ranges)
    got = (zread.where(pred)
           .where((F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[1])
                  & (F.col("lat") >= bbox[2]) & (F.col("lat") <= bbox[3])))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(zkey" in plan or "zkey" in plan.split(
        "PushedFilters: [")[1].split("]")[0]
    brute = {r.id for r in df.where(
        (F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[1])
        & (F.col("lat") >= bbox[2]) & (F.col("lat") <= bbox[3])).collect()}
    assert {r.id for r in got.collect()} == brute


# ---------------------------------------------------------------------------
# driver-query parity is covered by tools/selfcheck.py (zorder_bbox,
# geohash_rollup); here just pin that the bbox constants stay coherent
# ---------------------------------------------------------------------------

def test_entry_bbox_constants_valid():
    import __spark_entry__ as e
    ranges = Z.bbox_ranges(e.ZB_LON_MIN, e.ZB_LON_MAX, e.ZB_LAT_MIN,
                           e.ZB_LAT_MAX, e.ZB_BITS, e.ZB_MAX_RANGES)
    assert 1 <= len(ranges) <= e.ZB_MAX_RANGES
