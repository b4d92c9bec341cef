"""Static EPSG convenience registry: code -> proj-string.

The reference resolves EPSG codes through its SQLite catalog
(src/iso19111/factory.cpp:126-292).  This engine vendors the most-used
codes as a static table built from public EPSG definitions (the same
definitions PROJ ships in its proj.db / legacy epsg init file), plus
programmatic expansion of the WGS84/ETRS89/NAD83/ED50 UTM ranges.

`resolve("EPSG:32632")` (case-insensitive, bare integers accepted) returns
the proj-string; unknown codes raise NotImplementedError — never a silent
fallback.
"""

from __future__ import annotations

# hand-vendored, public EPSG definitions (classic proj4 strings)
_STATIC: dict[int, str] = {
    # geographic
    4326: "+proj=longlat +datum=WGS84",
    4258: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",          # ETRS89
    4269: "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",          # NAD83
    4230: "+proj=longlat +ellps=intl +towgs84=-87,-98,-121",    # ED50
    4277: ("+proj=longlat +ellps=airy "
           "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489"),  # OSGB36
    4314: ("+proj=longlat +ellps=bessel "
           "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7"),  # DHDN
    4313: ("+proj=longlat +ellps=intl "
           "+towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,"
           "-1.2747"),                                           # Belge 1972
    4275: "+proj=longlat +ellps=clrk80ign +towgs84=-168,-60,320",  # NTF
    4807: ("+proj=longlat +ellps=clrk80ign +towgs84=-168,-60,320 "
           "+pm=paris"),                                # NTF (Paris)
    4978: "+proj=geocent +datum=WGS84",
    # global projected
    3857: "+proj=webmerc +datum=WGS84",
    4087: "+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84",
    6933: "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84",
    # Europe-wide
    3035: ("+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 "
           "+ellps=GRS80 +towgs84=0,0,0 +units=m"),
    3034: ("+proj=lcc +lat_0=52 +lon_0=10 +lat_1=35 +lat_2=65 "
           "+x_0=4000000 +y_0=2800000 +ellps=GRS80 +towgs84=0,0,0 +units=m"),
    # national grids
    27700: ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 "
            "+y_0=-100000 +ellps=airy "
            "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489 "
            "+units=m"),
    2154: ("+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 +x_0=700000 "
           "+y_0=6600000 +ellps=GRS80 +towgs84=0,0,0 +units=m"),
    31370: ("+proj=lcc +lat_0=90 +lon_0=4.367486666666666 "
            "+lat_1=51.16666723333333 +lat_2=49.8333339 +x_0=150000.013 "
            "+y_0=5400088.438 +ellps=intl "
            "+towgs84=-106.869,52.2978,-103.724,0.3366,-0.457,1.8422,-1.2747 "
            "+units=m"),
    28992: ("+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 "
            "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel "
            "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,"
            "4.0725 +units=m"),
    2056: ("+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
           "+k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel "
           "+towgs84=674.374,15.056,405.346 +units=m"),
    21781: ("+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 "
            "+k_0=1 +x_0=600000 +y_0=200000 +ellps=bessel "
            "+towgs84=674.4,15.1,405.3 +units=m"),
    5514: ("+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 "
           "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel "
           "+towgs84=589,76,480 +units=m"),
    2193: ("+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 "
           "+y_0=10000000 +ellps=GRS80 +towgs84=0,0,0 +units=m"),
    3577: ("+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 +x_0=0 "
           "+y_0=0 +ellps=GRS80 +towgs84=0,0,0 +units=m"),
    5070: ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 "
           "+y_0=0 +ellps=GRS80 +towgs84=0,0,0 +units=m"),
    # polar
    3031: ("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 "
           "+datum=WGS84 +units=m"),
    3413: ("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 "
           "+datum=WGS84 +units=m"),
    3995: ("+proj=stere +lat_0=90 +lat_ts=71 +lon_0=0 +x_0=0 +y_0=0 "
           "+datum=WGS84 +units=m"),
    # DHDN Gauss-Krueger zones 2-5 (31466-31469)
    31466: ("+proj=tmerc +lat_0=0 +lon_0=6 +k=1 +x_0=2500000 +y_0=0 "
            "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 "
            "+units=m"),
    31467: ("+proj=tmerc +lat_0=0 +lon_0=9 +k=1 +x_0=3500000 +y_0=0 "
            "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 "
            "+units=m"),
    31468: ("+proj=tmerc +lat_0=0 +lon_0=12 +k=1 +x_0=4500000 +y_0=0 "
            "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 "
            "+units=m"),
    31469: ("+proj=tmerc +lat_0=0 +lon_0=15 +k=1 +x_0=5500000 +y_0=0 "
            "+ellps=bessel +towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7 "
            "+units=m"),
}


def resolve(code) -> str:
    """Authority code ('EPSG:32632', 'IGNF:LAMB93', 'ESRI:102100', an
    OGC urn, or a bare int = EPSG) -> proj-string.  Non-EPSG authorities
    resolve through the vendored multi-authority catalog
    (proj_spark.factory; reference ships ESRI/IGNF registries in
    data/sql/esri.sql, ignf.sql and accepts them in createFromUserInput,
    src/iso19111/io.cpp:5611+)."""
    s = str(code).strip()
    if s.lower().startswith("urn:"):
        from proj_spark import factory
        s = factory.normalize_code(s)
    if ":" in s:
        auth, num = s.split(":", 1)
        if auth.upper() != "EPSG":
            from proj_spark import factory
            return factory.crs_definition(s)
        s = num
    try:
        n = int(s)
    except ValueError:
        raise NotImplementedError(f"unparseable EPSG code {code!r}")
    if n in _STATIC:
        return _STATIC[n]
    # UTM ranges (programmatic, public zone arithmetic)
    if 32601 <= n <= 32660:   # WGS84 north
        return f"+proj=utm +zone={n - 32600} +datum=WGS84 +units=m"
    if 32701 <= n <= 32760:   # WGS84 south
        return f"+proj=utm +zone={n - 32700} +south +datum=WGS84 +units=m"
    if 25828 <= n <= 25838:   # ETRS89 / UTM
        return (f"+proj=utm +zone={n - 25800} +ellps=GRS80 +towgs84=0,0,0 "
                f"+units=m")
    if 26901 <= n <= 26923:   # NAD83 / UTM
        return (f"+proj=utm +zone={n - 26900} +ellps=GRS80 +towgs84=0,0,0 "
                f"+units=m")
    if 23028 <= n <= 23038:   # ED50 / UTM
        return (f"+proj=utm +zone={n - 23000} +ellps=intl "
                f"+towgs84=-87,-98,-121 +units=m")
    if 28348 <= n <= 28358:   # GDA94 / MGA
        return (f"+proj=utm +zone={n - 28300} +south +ellps=GRS80 "
                f"+towgs84=0,0,0 +units=m")
    # fall back to the vendored EPSG catalog (proj_spark.factory)
    from proj_spark import factory
    return factory.crs_definition(n)
