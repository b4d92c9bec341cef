"""The `pages` table: deterministic synthesis + geotag extraction.

Schema fixed by the engine contract (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Synthesis (seedless, fully deterministic integer arithmetic so any engine
can reproduce it): row i gets a Zipf-skewed domain, a lat/lon drawn from a
40-city cluster mixture (70%) or a uniform band (30%), an html body whose
only geo content is a <meta geo.position> (or ICBM, 10% of rows) tag, and
a text paragraph keyed by the url.

INVARIANT: every engine pipeline must carry `text` through byte-identical
per url — nothing in this module or downstream ever rewrites it.

Extraction is pure Spark SQL (regexp on the decoded html) — no UDF, fully
codegen'd, and `text` is untouched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# 40 world-city cluster centers (lon, lat) — public coordinates, rounded
CITY_CENTERS: list[tuple[float, float]] = [
    (-74.0, 40.7), (-118.2, 34.1), (-87.6, 41.9), (-122.4, 37.8), (-77.0, 38.9),
    (-3.7, 40.4), (-0.1, 51.5), (2.35, 48.86), (13.4, 52.5), (12.5, 41.9),
    (4.9, 52.4), (-9.1, 38.7), (18.1, 59.3), (37.6, 55.8), (28.98, 41.0),
    (31.2, 30.0), (36.8, -1.3), (18.4, -33.9), (3.4, 6.5), (-43.2, -22.9),
    (-58.4, -34.6), (-70.7, -33.4), (-99.1, 19.4), (-79.4, 43.7), (-123.1, 49.3),
    (139.7, 35.7), (135.5, 34.7), (126.98, 37.6), (121.5, 31.2), (116.4, 39.9),
    (114.1, 22.3), (103.8, 1.35), (100.5, 13.8), (72.9, 19.1), (77.2, 28.6),
    (151.2, -33.9), (144.96, -37.8), (174.8, -36.9), (55.3, 25.3), (34.8, 32.1),
]


def _round6(x):
    """round(x, 6) as pure arithmetic: half-away-from-zero on x*1e6.

    Chosen over F.round for two reasons: (a) no per-row BigDecimal
    allocation (F.round on doubles churns the GC at 10^8-row scale and
    falls out of cheap codegen), and (b) it is the *same* algorithm
    DuckDB's ROUND(double, n) uses (std::round(v*1e6)/1e6), so oracle
    parity holds bit-for-bit on the synthesized coordinates."""
    scaled = x * F.lit(1e6)
    mag = F.floor(F.abs(scaled) + F.lit(0.5))
    return F.signum(scaled) * mag / F.lit(1e6)


def _geo_columns(i, n_domains: int):
    """The deterministic (h, dom, url, lon, lat) column expressions shared
    by the full pages synthesis and the html-free points synthesis."""
    # Zipf-ish skew: domain = i mod (1 + (i*knuth) mod n_domains) biases
    # small domain ids to be hot
    h = F.pmod(i * F.lit(2654435761), F.lit(2 ** 31))
    dom = F.pmod(h, F.pmod(h, F.lit(n_domains)) + F.lit(1))
    url = F.concat(F.lit("https://site"), dom.cast("string"),
                   F.lit(".example/page/"), i.cast("string"))

    # 70% clustered around city centers, 30% quasi-uniform on +-60 lat band
    centers_lon = F.array(*[F.lit(c[0]) for c in CITY_CENTERS])
    centers_lat = F.array(*[F.lit(c[1]) for c in CITY_CENTERS])
    cidx = F.pmod(h, F.lit(len(CITY_CENTERS))).cast("int")
    # deterministic sub-degree jitter in (-1, 1)
    j1 = (F.pmod(i * F.lit(48271), F.lit(20001)) - F.lit(10000)) / F.lit(10000.0)
    j2 = (F.pmod(i * F.lit(69621), F.lit(20001)) - F.lit(10000)) / F.lit(10000.0)
    clustered = F.pmod(h, F.lit(10)) < 7
    lon = F.when(clustered, F.element_at(centers_lon, cidx + 1) + j1 * F.lit(1.5)) \
           .otherwise(_round6(j1 * F.lit(179.99)))
    lat = F.when(clustered, F.element_at(centers_lat, cidx + 1) + j2 * F.lit(1.0)) \
           .otherwise(_round6(j2 * F.lit(59.99)))
    return h, dom, url, _round6(lon), _round6(lat)


def synth_points(spark: SparkSession, n_rows: int, n_domains: int = 1000) -> DataFrame:
    """Geotagged points only (url, domain, lon, lat) — the post-extraction
    shape — for kernel-bound benchmarking without html materialization."""
    df = spark.range(0, n_rows).withColumnRenamed("id", "i")
    h, dom, url, lon, lat = _geo_columns(F.col("i"), n_domains)
    return df.select(url.alias("url"), dom.cast("string").alias("domain"),
                     lon.alias("lon"), lat.alias("lat"))


def synth_pages(spark: SparkSession, n_rows: int, n_domains: int = 1000) -> DataFrame:
    """Deterministic Common-Crawl-style pages table with embedded geotags."""
    df = spark.range(0, n_rows).withColumnRenamed("id", "i")
    i = F.col("i")
    h, dom, url, lon, lat = _geo_columns(i, n_domains)

    # fixed-point formatting: a plain double->string cast flips to
    # scientific notation below 1e-3 (lon near 0 -> "5.0E-5"), which the
    # extraction regexp would silently truncate
    lat_s = F.format_string("%.6f", lat)
    lon_s = F.format_string("%.6f", lon)
    icbm = F.pmod(i, F.lit(10)) == 3  # 10% use the ICBM meta variant
    geotag = F.when(
        icbm,
        F.concat(F.lit('<meta name="ICBM" content="'), lat_s,
                 F.lit(", "), lon_s, F.lit('">')),
    ).otherwise(
        F.concat(F.lit('<meta name="geo.position" content="'), lat_s,
                 F.lit(";"), lon_s, F.lit('">')),
    )
    html = F.encode(F.concat(
        F.lit("<html><head>"), geotag,
        F.lit('<meta charset="utf-8"></head><body><h1>page '), i.cast("string"),
        F.lit("</h1><p>"), F.md5(url), F.lit("</p></body></html>")), "UTF-8")

    text = F.concat(F.lit("Document "), i.cast("string"), F.lit(" :: "),
                    F.md5(url), F.lit(" "), F.md5(F.concat(url, F.lit("#2"))))
    langs = F.array(*[F.lit(x) for x in ["en", "de", "fr", "es", "pt", "ja"]])
    lang = F.element_at(langs, F.pmod(dom, F.lit(6)).cast("int") + 1)
    warc_ts = F.timestamp_seconds(F.lit(1704067200) + i)  # 2024-01-01 + i s

    return df.select(
        url.alias("url"), warc_ts.alias("warc_ts"), html.alias("html"),
        text.alias("text"), lang.alias("lang"),
    )


def pages_table(spark: SparkSession, n_rows: int, n_domains: int = 1000) -> DataFrame:
    """The pages *table*: synthesis materialized to parquet once per scale.

    Real deployments read pages from an Iceberg/parquet table; synthesizing
    lazily instead would (a) recompute the html construction once per
    downstream expression after Catalyst's projection collapse (the whole
    synth expr gets re-inlined into every regexp_extract, blowing past the
    64 KB codegen method limit), and (b) redo the work per query.  A
    one-time parquet write restores the scan->prune->push-down shape the
    engine is designed around.
    """
    cache_root = os.environ.get("PROJ_SPARK_CACHE",
                                os.path.join(os.path.dirname(os.path.dirname(
                                    os.path.abspath(__file__))), ".cache"))
    path = os.path.join(cache_root, f"pages_v2_{n_rows}_{n_domains}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_pages(spark, n_rows, n_domains).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def extract_geotags(pages: DataFrame) -> DataFrame:
    """Pull (lat, lon) out of the html geotags; `text` is never touched.

    Pure expression pipeline: decode -> regexp_extract -> cast. Rows with
    no tag get null lat/lon (kept; downstream ops filter as needed).
    Column pruning matters at scale: this is the only stage that reads
    `html`, so Catalyst prunes the 10-100x heavier column everywhere else.
    """
    doc = F.decode(F.col("html"), "UTF-8")
    geo = F.regexp_extract(doc, r'<meta name="geo\.position" content="([-0-9.]+);([-0-9.]+)"', 0)
    geo_lat = F.regexp_extract(doc, r'<meta name="geo\.position" content="([-0-9.]+);([-0-9.]+)"', 1)
    geo_lon = F.regexp_extract(doc, r'<meta name="geo\.position" content="([-0-9.]+);([-0-9.]+)"', 2)
    icbm_lat = F.regexp_extract(doc, r'<meta name="ICBM" content="([-0-9.]+),\s*([-0-9.]+)"', 1)
    icbm_lon = F.regexp_extract(doc, r'<meta name="ICBM" content="([-0-9.]+),\s*([-0-9.]+)"', 2)
    lat_s = F.when(geo != "", geo_lat).otherwise(icbm_lat)
    lon_s = F.when(geo != "", geo_lon).otherwise(icbm_lon)
    return (pages
            .withColumn("lat", F.when(lat_s != "", lat_s.cast("double")))
            .withColumn("lon", F.when(lon_s != "", lon_s.cast("double"))))
