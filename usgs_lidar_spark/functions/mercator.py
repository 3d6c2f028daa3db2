"""Web-Mercator (EPSG:3857) <-> WGS84 (EPSG:4326) reprojection as pure
column math — no UDF.

Reference: ``convert_epsg`` (/root/reference/scripts/usgs_lidar.py:441-463,
pyproj-backed ``to_crs`` on a geometry column) and the PDAL
``filters.reprojection`` stage (/root/reference/pipeline.json:15-20).

The spherical Web-Mercator transform is closed-form:
    x = R * radians(lon)
    y = R * ln(tan(pi/4 + radians(lat)/2))
    lon = degrees(x / R)
    lat = degrees(2*atan(exp(y / R)) - pi/2)
with R = 6378137.0 (WGS84 semi-major axis). Valid for |lat| <= 85.05113°
(the Mercator square); callers should clamp/filter beyond that. Because it
compiles to built-in expressions it stays inside whole-stage codegen —
general EPSG pairs that genuinely need pyproj go through a pandas UDF
(see operators/spatial.py), never the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: WGS84 semi-major axis in meters (the Web-Mercator sphere radius).
R_MAJOR = 6378137.0

#: Latitude limit of the Web-Mercator square.
MAX_LAT = 85.05112877980659


def lon_to_x(lon: Column | str) -> Column:
    return F.lit(R_MAJOR) * F.radians(F.col(lon) if isinstance(lon, str) else lon)


def lat_to_y(lat: Column | str) -> Column:
    lat = F.col(lat) if isinstance(lat, str) else lat
    return F.lit(R_MAJOR) * F.log(F.tan(F.lit(0.25) * F.pi() + F.radians(lat) / 2))


def x_to_lon(x: Column | str) -> Column:
    x = F.col(x) if isinstance(x, str) else x
    return F.degrees(x / F.lit(R_MAJOR))


def y_to_lat(y: Column | str) -> Column:
    y = F.col(y) if isinstance(y, str) else y
    return F.degrees(2 * F.atan(F.exp(y / F.lit(R_MAJOR))) - F.lit(0.5) * F.pi())
