"""String/regex scalar functions (SURVEY.md §2 T1-T5).

Every helper compiles to built-in Catalyst expressions. Reference behaviors
pinned here:
  * T1 year extraction: regex ``20[0-9][0-9]+`` over the filename, first
    match, e.g. ``FL_Elgin_2006-2008`` -> ``2006``
    (/root/reference/scripts/usgs_lidar.py:224-242).
  * T2 character strip (``location.replace('/', '')``, :234).
  * T3/T4 WKT / bounds serialization (:73-82).
  * T5 null-token rewrite (``"nan"`` year -> label, :329-332).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: The reference's year regex (scripts/usgs_lidar.py:235).
YEAR_PATTERN = "20[0-9][0-9]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def extract_year(filename: Column | str) -> Column:
    """First ``20xx``-style match as int; NULL when absent (the reference
    returns None). regexp_extract yields '' on no-match, which nullif folds
    to NULL before the cast."""
    m = F.regexp_extract(_c(filename), YEAR_PATTERN, 0)
    return F.nullif(m, F.lit("")).cast("int")


def strip_chars(col: Column | str, chars: str = "/") -> Column:
    """T2: remove every occurrence of the given characters."""
    return F.translate(_c(col), chars, "")


def name_prefix(filename: Column | str) -> Column:
    """The filename with its year suffix and trailing separators removed —
    the `name` half of fetch_name_and_year (scripts/usgs_lidar.py:224-242)."""
    stripped = strip_chars(filename, "/")
    return F.regexp_replace(stripped, f"_?{YEAR_PATTERN}.*$", "")


def year_label(year: Column | str, label: str = "not_specified") -> Column:
    """T5: null year -> sentinel label (reference writes
    ``"Year: not_specified"``)."""
    return F.coalesce(_c(year).cast("string"), F.lit(label))


def bounds_str(minx, maxx, miny, maxy) -> Column:
    """T4: the reference's bounds serialization
    ``([minx, maxx],[miny, maxy])`` (scripts/usgs_lidar.py:82)."""
    return F.format_string(
        "([%s, %s],[%s, %s])", _c(minx), _c(maxx), _c(miny), _c(maxy)
    )


def wkt_point(x: Column | str, y: Column | str, digits: int = 2) -> Column:
    """T3 analog: WKT serialization of a point with fixed precision."""
    fmt = f"POINT(%.{digits}f %.{digits}f)"
    return F.format_string(fmt, _c(x), _c(y))
