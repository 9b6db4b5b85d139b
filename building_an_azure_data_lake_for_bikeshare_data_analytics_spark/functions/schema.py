"""Schema formatting: the engine's version of the reference's
``format_columns`` (ipynb:L960-997, cell 8).

The reference formats each raw ``_c*`` CSV table with two dicts — a rename
map and a cast map — applied as a single alias+cast projection (P1/P2,
ipynb:L976/L979). That one-pass ``select`` is already the right shape at any
scale (one narrow projection, no shuffle); we keep it and add a declarative
table registry so schemas are data, not code.

Decimal subtlety preserved (SURVEY.md §1.2): the reference casts payment
``amount`` to bare ``decimal`` = ``DecimalType(10,0)`` (ipynb:L988), which
rounds cents away before any aggregation. ``BIKESHARE_CASTS`` records exactly
that; engines wanting cents use an explicit DecimalType(10,2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DataTypeLike = T.DataType | str


def format_columns(
    df: DataFrame,
    renames: dict[str, str] | None = None,
    casts: dict[str, DataTypeLike] | None = None,
) -> DataFrame:
    """Bulk rename + cast in one projection.

    Mirrors the reference's two list-comprehension selects (ipynb:L976, L979)
    but fused into a single ``select`` so Catalyst sees one projection node.
    Columns absent from the maps pass through untouched. ``casts`` keys are
    the *new* (post-rename) names.
    """
    renames = renames or {}
    casts = casts or {}
    cols = []
    for c in df.columns:
        new = renames.get(c, c)
        col = F.col(c).alias(new)
        if new in casts:
            col = F.col(c).cast(casts[new]).alias(new)
        cols.append(col)
    return df.select(*cols)


# --- reference bikeshare schema registry (ipynb:L985-991, cell 8) ---------

BIKESHARE_RENAMES: dict[str, dict[str, str]] = {
    "payments": {"_c0": "payment_id", "_c1": "date_id", "_c2": "amount", "_c3": "rider_id"},
    "trips": {
        "_c0": "trip_id",
        "_c1": "rideable_type",
        "_c2": "started_at",
        "_c3": "ended_at",
        "_c4": "start_station_id",
        "_c5": "end_station_id",
        "_c6": "rider_id",
    },
    "riders": {
        "_c0": "rider_id",
        "_c1": "first",
        "_c2": "last",
        "_c3": "address",
        "_c4": "birthday",
        "_c5": "account_start_date",
        "_c6": "account_end_date",
        "_c7": "is_member",
    },
    "stations": {"_c0": "station_id", "_c1": "name", "_c2": "latitude", "_c3": "longitude"},
}

BIKESHARE_CASTS: dict[str, dict[str, DataTypeLike]] = {
    # bare `decimal` in the reference == DecimalType(10,0): integer dollars.
    "payments": {"payment_id": "int", "date_id": "date", "amount": T.DecimalType(10, 0), "rider_id": "int"},
    "trips": {"started_at": "timestamp", "ended_at": "timestamp", "rider_id": "int"},
    "riders": {
        "rider_id": "int",
        "birthday": "date",
        "account_start_date": "date",
        "account_end_date": "date",
        "is_member": "boolean",
    },
    "stations": {"latitude": "float", "longitude": "float"},
}


def format_bikeshare_table(df: DataFrame, table: str) -> DataFrame:
    """Apply the reference's rename+cast maps for one of the four raw tables."""
    return format_columns(df, BIKESHARE_RENAMES[table], BIKESHARE_CASTS[table])
