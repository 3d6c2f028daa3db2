"""Scalar-function golden tests: Mercator vs known EPSG:3857 values,
reference string semantics, text stats edge cases."""

from __future__ import annotations

import math

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
    """General-EPSG reprojection is pyproj-gated: clear error without it,
    working Arrow UDF with it."""
    from usgs_lidar_spark.functions.projection import have_pyproj, reproject_udf

    if not have_pyproj():
        import pytest as _pytest

        with _pytest.raises(NotImplementedError):
            reproject_udf(4326, 32615)
    else:
        udf = reproject_udf(4326, 3857)
        df = spark.createDataFrame([(0.0, 0.0)], ["lon", "lat"])
        out = df.select(udf("lon", "lat").alias("p")).collect()[0]["p"]
        assert abs(out["x"]) < 1e-6
