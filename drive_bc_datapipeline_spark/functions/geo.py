"""Geospatial column functions (UDF-free — native trig only).

Reference parity: cluster.py computed haversine distances through
sklearn's metric on collected data; here the same math is a Column
expression evaluated inside whole-stage codegen, usable in any filter,
join radius, or aggregation at full scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lon) points (deg)."""
    dlat = F.radians((lat2 - lat1) / 2.0)
    dlon = F.radians((lon2 - lon1) / 2.0)
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians(lat1)) * F.cos(
        F.radians(lat2)
    ) * F.pow(F.sin(dlon), 2)
    return 2.0 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    """(cell_x, cell_y) integer grid coordinates for density clustering."""
    return (
        F.floor(lon / cell_deg).cast("int"),
        F.floor(lat / cell_deg).cast("int"),
    )
