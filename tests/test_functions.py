"""Scalar-function golden tests: Mercator vs known EPSG:3857 values,
reference string semantics, text stats edge cases."""

from __future__ import annotations

import json
import math
from pathlib import Path

import pytest

from pyspark.sql import functions as F

from usgs_lidar_spark.functions import mercator as M
from usgs_lidar_spark.functions.strings import extract_year, name_prefix, year_label
from usgs_lidar_spark.functions.textstats import (
    fingerprint,
    lang_id,
    token_count,
)


def test_mercator_golden(spark):
    """Closed-form Web Mercator vs independently computed values (the
    spherical EPSG:3857 formulas; reference used pyproj,
    scripts/usgs_lidar.py:441-463)."""
    df = spark.createDataFrame([(0.0, 0.0), (-93.6, 42.03), (180.0, 85.0511)], ["lon", "lat"])
    out = df.select(
        M.lon_to_x("lon").alias("x"), M.lat_to_y("lat").alias("y"),
        "lon", "lat",
    ).collect()
    R = 6378137.0
    for r in out:
        exp_x = R * math.radians(r["lon"])
        exp_y = R * math.log(math.tan(math.pi / 4 + math.radians(r["lat"]) / 2))
        assert abs(r["x"] - exp_x) < 1e-6
        assert abs(r["y"] - exp_y) < 1e-6
    # Ames, IA (the demo polygon area): x ~ -10.42e6 m
    ames = [r for r in out if r["lon"] == -93.6][0]
    assert abs(ames["x"] - (-10419526.0)) < 1000


def test_mercator_roundtrip(spark):
    df = spark.range(100).select(
        ((F.col("id") * 3.6) - 180.0).alias("lon"),
        ((F.col("id") * 1.7) - 85.0).alias("lat"),
    )
    rt = df.select(
        "lon", "lat",
        M.x_to_lon(M.lon_to_x("lon")).alias("lon2"),
        M.y_to_lat(M.lat_to_y("lat")).alias("lat2"),
    ).collect()
    for r in rt:
        assert abs(r["lon"] - r["lon2"]) < 1e-9
        assert abs(r["lat"] - r["lat2"]) < 1e-9


def test_year_extraction_reference_semantics(spark):
    """T1 pinned cases (scripts/usgs_lidar.py:224-242, data/metadata.csv):
    FL_Elgin_2006-2008 -> 2006; IA_FullState -> NULL; strip slashes."""
    df = spark.createDataFrame(
        [("FL_Elgin_2006-2008/",), ("IA_FullState/",), ("AK_Brooks_2012/",)],
        ["filename"],
    )
    out = {
        r["filename"]: r.asDict()
        for r in df.select(
            "filename",
            extract_year("filename").alias("year"),
            name_prefix("filename").alias("region"),
            year_label(extract_year("filename")).alias("label"),
        ).collect()
    }
    assert out["FL_Elgin_2006-2008/"]["year"] == 2006
    assert out["FL_Elgin_2006-2008/"]["region"] == "FL_Elgin"
    assert out["IA_FullState/"]["year"] is None
    assert out["IA_FullState/"]["label"] == "not_specified"
    assert out["AK_Brooks_2012/"]["year"] == 2012
    assert out["AK_Brooks_2012/"]["region"] == "AK_Brooks"


def test_token_count_empty_and_blank(spark):
    df = spark.createDataFrame([("",), ("   ",), ("a b  c",)], ["text"])
    got = [r[0] for r in df.select(token_count("text")).collect()]
    assert got == [0, 0, 3]


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog in the house",),
         ("der hund und die katze ist nicht da",),
         ("xyzzy plugh",)],
        ["text"],
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == ["en", "de", "und"]


def test_fingerprint_matches_python(spark):
    text = "hello world"
    df = spark.createDataFrame([(text,)], ["text"])
    got = df.select(fingerprint("text").alias("fp")).collect()[0]["fp"]
    h = 0
    for ch in text[:64]:
        h = (h * 31 + ord(ch)) % 1_000_000_007
    assert got == h


def test_general_projection_gated(spark):
    """Exotic-EPSG reprojection is pyproj-gated: clear error without it,
    working Arrow UDF with it. (UTM/3857/4326 pairs no longer hit this
    path at all — see the tmerc tests below.)"""
    from usgs_lidar_spark.functions.projection import have_pyproj, reproject_udf

    if not have_pyproj():
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            reproject_udf(4326, 2193)  # NZTM — genuinely outside the expr set
    else:
        udf = reproject_udf(4326, 3857)
        df = spark.createDataFrame([(0.0, 0.0)], ["lon", "lat"])
        out = df.select(udf("lon", "lat").alias("p")).collect()[0]["p"]
        assert abs(out["x"]) < 1e-6


def test_reproject_udf_plumbing_with_injected_transformer(spark):
    """The general-EPSG UDF tier end-to-end WITHOUT pyproj: an injected
    transformer factory proves the (x, y) -> struct<x, y> Arrow plumbing
    — multi-partition batching, struct field access, null propagation —
    with exact affine expected values. The fake is defined LOCALLY so
    cloudpickle ships it by value (a test-module global would pickle by
    reference to a module the workers can't import)."""
    from usgs_lidar_spark.functions.projection import reproject_udf

    class AffineFakeTransformer:
        """pyproj.Transformer stand-in: a known affine map."""

        def transform(self, xs, ys):
            return xs * 2.0 + 1.0, ys - 0.5

    udf = reproject_udf(
        4326, 2193, transformer_factory=AffineFakeTransformer
    )
    rows = [(float(i), float(-i)) for i in range(1000)] + [(None, 3.0)]
    df = spark.createDataFrame(rows, "x double, y double").repartition(7)
    out = df.select("x", "y", udf("x", "y").alias("p")).select(
        "x", "y", F.col("p.x").alias("px"), F.col("p.y").alias("py")
    )
    assert dict(out.dtypes)["px"] == "double"
    got = {r["x"]: (r["px"], r["py"]) for r in out.collect()}
    for i in range(1000):
        assert got[float(i)] == (2.0 * i + 1.0, -i - 0.5)
    # NULL input propagates as null/NaN through the float pipeline (Arrow
    # may render the NaN slot as SQL NULL), never a crash; the non-null
    # coordinate of the same row still transforms.
    import math

    px = got[None][0]
    assert px is None or math.isnan(px)
    assert got[None][1] == 2.5


# --- Transverse Mercator (UTM) expression path -----------------------------

TMERC_GOLDEN = Path(__file__).parent / "fixtures" / "tmerc_golden.json"


def _golden_cases():
    return json.loads(TMERC_GOLDEN.read_text())["cases"]


def test_tmerc_matches_independent_snyder_fixtures(spark):
    """Krüger-series expressions vs committed fixtures generated offline by
    an INDEPENDENT formulation (Snyder T/C/A/M). Snyder truncates ~1 mm
    inside a zone, so 5 mm tolerance; a wrong series coefficient would
    miss by meters."""
    from usgs_lidar_spark.functions import tmerc

    by_epsg: dict[int, list] = {}
    for c in _golden_cases():
        by_epsg.setdefault(c["epsg"], []).append(c)
    for epsg, cases in by_epsg.items():
        df = spark.createDataFrame(
            [(c["lon"], c["lat"], c["easting"], c["northing"]) for c in cases],
            "lon double, lat double, easting double, northing double",
        )
        E, N = tmerc.utm_forward("lon", "lat", epsg)
        for r in df.select(
            (E - F.col("easting")).alias("de"), (N - F.col("northing")).alias("dn")
        ).collect():
            assert abs(r["de"]) < 5e-3 and abs(r["dn"]) < 5e-3, (epsg, r)


def test_tmerc_roundtrip_micrometer(spark):
    """forward∘inverse is identity to ~µm across the zone, including the
    south-zone false northing."""
    from usgs_lidar_spark.functions import tmerc

    pts = [
        (lon, lat)
        for lon in (12.0, 13.5, 15.0, 16.5, 18.0)
        for lat in (-84.0, -45.0, -0.5, 0.0, 20.25, 60.0, 84.0)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for epsg in (32633, 32733):
        E, N = tmerc.utm_forward("lon", "lat", epsg)
        lon_rt, lat_rt = tmerc.utm_inverse(E, N, epsg)
        for r in df.select(
            (F.col("lon") - lon_rt).alias("dlon"),
            (F.col("lat") - lat_rt).alias("dlat"),
        ).collect():
            # 1e-10 deg ~ 1e-5 m.
            assert abs(r["dlon"]) < 1e-10 and abs(r["dlat"]) < 1e-10, (epsg, r)


def test_tmerc_central_meridian_is_meridian_arc(spark):
    """At lon = lon0 the northing must equal k0 * meridian arc length — an
    independent closed-form series (Snyder eq. 3-21) that shares no code
    with the Krüger path. Also pins E = 500000 exactly there."""
    from usgs_lidar_spark.functions import tmerc

    a, f = tmerc.A_WGS84, 1 / 298.257223563
    e2 = f * (2 - f)

    def meridian_arc(lat_deg: float) -> float:
        phi = math.radians(lat_deg)
        return a * (
            (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
            - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * phi)
            + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * phi)
            - (35 * e2**3 / 3072) * math.sin(6 * phi)
        )

    lats = [-80.0, -33.33, 0.0, 12.5, 45.0, 71.25, 84.0]
    df = spark.createDataFrame([(lat,) for lat in lats], "lat double")
    E, N = tmerc.tmerc_forward(F.lit(15.0), F.col("lat"), 15.0)
    rows = df.select("lat", E.alias("E"), N.alias("N")).collect()
    for r in rows:
        assert r["E"] == 500000.0, r
        assert abs(r["N"] - 0.9996 * meridian_arc(r["lat"])) < 1e-3, r


def test_tmerc_stays_in_codegen(spark):
    """D1 discipline: the whole UTM forward+inverse pipeline is built-in
    expressions — no Python eval node may appear in the plan."""
    from usgs_lidar_spark.functions import tmerc

    df = spark.range(100).select(
        (F.col("id") % 6 + 12).cast("double").alias("lon"),
        (F.col("id") % 160 - 80).cast("double").alias("lat"),
    )
    E, N = tmerc.utm_forward("lon", "lat", 32633)
    lon_rt, lat_rt = tmerc.utm_inverse(E, N, 32633)
    plan = df.select(E, N, lon_rt, lat_rt)._jdf.queryExecution().executedPlan().toString()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan


def test_reproject_cols_dispatch(spark):
    """The dispatcher covers every {4326, 3857, UTM} pair as expressions and
    refuses anything else with a pointer to the pyproj UDF."""
    from usgs_lidar_spark.functions.projection import reproject_cols

    df = spark.createDataFrame([(15.5, 47.25)], "lon double, lat double")
    # 4326 -> UTM -> 3857 -> 4326 composition closes to the start point.
    e, n = reproject_cols("lon", "lat", 4326, 32633)
    mx, my = reproject_cols(e, n, 32633, 3857)
    lon2, lat2 = reproject_cols(mx, my, 3857, 4326)
    r = df.select(
        (F.col("lon") - lon2).alias("dlon"), (F.col("lat") - lat2).alias("dlat")
    ).collect()[0]
    assert abs(r["dlon"]) < 1e-9 and abs(r["dlat"]) < 1e-9

    with pytest.raises(NotImplementedError, match="reproject_udf"):
        reproject_cols("lon", "lat", 4326, 2193)


def test_reproject_any_unified_dispatch(spark):
    """`reproject_any` (round 11): one call for ANY EPSG pair. Family
    pairs come back as pure expressions (no Python eval node in the
    executed plan); exotic pairs route through the Arrow UDF and return
    the struct fields as the same (x', y') column pair — proven here
    with the injected affine transformer; without pyproj AND without a
    factory the exotic tier still fails loudly at plan time."""
    from usgs_lidar_spark.functions.projection import (
        have_pyproj,
        reproject_any,
    )

    df = spark.createDataFrame(
        [(15.5, 47.25), (0.25, -33.5)], "lon double, lat double"
    )
    # Expression tier: same columns as reproject_cols, zero Python.
    mx, my = reproject_any("lon", "lat", 4326, 3857)
    plan = (
        df.select(mx.alias("x"), my.alias("y"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert node not in plan

    # Exotic tier with an injected transformer: the (x', y') pair is the
    # UDF struct's fields; values are the affine map exactly.
    class AffineFakeTransformer:
        def transform(self, xs, ys):
            return xs * 2.0 + 1.0, ys - 0.5

    ex, ey = reproject_any(
        "lon", "lat", 4326, 2193, transformer_factory=AffineFakeTransformer
    )
    got = df.select(ex.alias("x"), ey.alias("y")).collect()
    for r, (lon, lat) in zip(got, [(15.5, 47.25), (0.25, -33.5)]):
        assert r["x"] == 2.0 * lon + 1.0 and r["y"] == lat - 0.5

    if not have_pyproj():
        with pytest.raises(NotImplementedError, match="pyproj"):
            reproject_any("lon", "lat", 4326, 2193)


def test_reproject_udf_kruger_golden_runs_in_container(spark):
    """The UDF-tier golden that EXECUTES here (round 13, r11 verdict item
    4: the pyproj golden below is skipif-gated and has never run in this
    container): `reproject_udf`'s Arrow batch path carrying genuinely
    non-affine geodesy — the pure-numpy `KrugerUTMTransformer` — pinned
    against the `m3_utm_reproject` expression path (`utm_forward`)
    within 4 ulp (~2e-9 m at UTM northing magnitudes — 1 ulp at 8e6 m
    is already 1.9e-9, so a fixed 1e-9 bound would be below double
    resolution). Same series constants in the same operation order on
    both sides, so any disagreement above last-ulp libm-vs-JVM noise is
    an Arrow plumbing bug (batch slicing, dtype coercion, struct field
    mapping), which is what this test exists to catch. Also pins that
    the plan really goes through a Python worker (ArrowEvalPython) and
    the expression path really doesn't."""
    from functools import partial

    from usgs_lidar_spark.functions.projection import reproject_udf
    from usgs_lidar_spark.functions.tmerc import (
        KrugerUTMTransformer,
        utm_forward,
    )

    pts = [
        (lon, lat)
        for lon in (12.0, 13.5, 15.0, 16.5, 18.0)
        for lat in (-84.0, -45.0, -0.5, 0.0, 20.25, 60.0, 84.0)
    ]
    df = spark.createDataFrame(pts, "lon double, lat double")
    for epsg in (32633, 32733):
        udf = reproject_udf(
            4326, epsg,
            transformer_factory=partial(KrugerUTMTransformer, epsg),
        )
        E, N = utm_forward("lon", "lat", epsg)
        proj = df.select(
            udf("lon", "lat").alias("p"), E.alias("E"), N.alias("N")
        )
        plan = proj._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        for r in proj.select(
            "E", "N",
            (F.col("p.x") - F.col("E")).alias("dx"),
            (F.col("p.y") - F.col("N")).alias("dy"),
        ).collect():
            # error rides the largest INTERMEDIATE (the south zone adds
            # a 1e7 false northing before cancellation back to a small N)
            nmag = abs(r["N"]) + (1e7 if epsg == 32733 else 0.0)
            assert abs(r["dx"]) <= 4 * math.ulp(abs(r["E"])), (epsg, r)
            assert abs(r["dy"]) <= 4 * math.ulp(nmag), (epsg, r)


@pytest.mark.skipif(
    not __import__(
        "usgs_lidar_spark.functions.projection", fromlist=["have_pyproj"]
    ).have_pyproj(),
    reason="pyproj not installed in this container",
)
def test_reproject_any_exotic_golden_against_pyproj(spark):
    """With pyproj present, the exotic tier of `reproject_any` must
    reproduce pyproj's own Transformer output exactly (same library,
    batched through Arrow) for a genuinely-exotic pair: EPSG:4326 ->
    EPSG:2193 (NZTM2000) at Wellington and Auckland."""
    import pyproj

    from usgs_lidar_spark.functions.projection import reproject_any

    pts = [(174.7762, -41.2865), (174.7633, -36.8485)]
    tr = pyproj.Transformer.from_crs(4326, 2193, always_xy=True)
    df = spark.createDataFrame(pts, "lon double, lat double")
    ex, ey = reproject_any("lon", "lat", 4326, 2193)
    got = df.select(
        "lon", F.col("lon"), ex.alias("x"), ey.alias("y")
    ).collect()
    for r, (lon, lat) in zip(got, pts):
        px, py = tr.transform(lon, lat)
        assert abs(r["x"] - px) < 1e-9 and abs(r["y"] - py) < 1e-9


@pytest.mark.skipif(
    not __import__(
        "usgs_lidar_spark.functions.projection", fromlist=["have_pyproj"]
    ).have_pyproj(),
    reason="pyproj not installed in this container",
)
def test_tmerc_fixtures_against_pyproj(spark):
    """With pyproj present, both the golden fixtures and the expression
    path must agree with pyproj to 5 mm (fixture) / 1e-4 m (expressions)."""
    import pyproj

    from usgs_lidar_spark.functions import tmerc

    for c in _golden_cases():
        tr = pyproj.Transformer.from_crs(4326, c["epsg"], always_xy=True)
        px, py = tr.transform(c["lon"], c["lat"])
        assert abs(px - c["easting"]) < 5e-3 and abs(py - c["northing"]) < 5e-3, c
        df = spark.createDataFrame([(c["lon"], c["lat"])], "lon double, lat double")
        E, N = tmerc.utm_forward("lon", "lat", c["epsg"])
        r = df.select(E.alias("E"), N.alias("N")).collect()[0]
        assert abs(r["E"] - px) < 1e-4 and abs(r["N"] - py) < 1e-4, c
