"""Geo scalar functions.

The reference declares a geo-bearing entity (``atmlog`` with
latitude/longitude floats, reference entities/model.scala:16-23) but never
uses it; a complete engine still needs the distance primitive that such a
schema implies.  Haversine is expressed with builtin column math so it
stays in codegen — no UDF, valid inside filters/joins (e.g. a
distance-threshold geo join prunes with it directly).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km between two (degree) coordinate pairs.

    d = 2R * asin(sqrt(sin²(Δφ/2) + cosφ1·cosφ2·sin²(Δλ/2)))
    """
    rad = math.pi / 180.0
    dphi = (lat2 - lat1) * rad / 2.0
    dlmb = (lon2 - lon1) * rad / 2.0
    a = (F.sin(dphi) ** 2
         + F.cos(lat1 * rad) * F.cos(lat2 * rad) * F.sin(dlmb) ** 2)
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))
