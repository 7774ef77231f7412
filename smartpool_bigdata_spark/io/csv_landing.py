"""Drift-tolerant CSV landing-zone ingestion (S4/S5).

Reference: CSV drops under ``landing/electricity_prices/date=YYYY-MM-DD/``
read with ``header=true`` and NO schema inference, then explicitly typed,
accepting three timestamp layouts that drifted across producer versions —
``ts`` | ``ts_utc`` (ISO-8601 with zone suffix) | ``date``+``hour``
(``spark-apps/05_ingest_electricity_csv.py:25-46``,
``notebooks/05_ingest_electricity_csv.ipynb:171-180``).

Scale: schema inference is OFF (it would scan the data twice and lock in
whatever the first files looked like); typing is explicit per column, so a
malformed cell becomes NULL for the expectations layer to quarantine
rather than poisoning inference. ``recursiveFileLookup`` handles arbitrary
drop-directory nesting; passing ``dates=`` instead prunes at the path
level — only the named partitions are listed, which at a 100 TB landing
zone is the difference between listing everything and listing one day.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def drift_tolerant_timestamp(
    df: DataFrame,
    out_col: str = "ts",
    ts_col: str = "ts",
    ts_utc_col: str = "ts_utc",
    date_col: str = "date",
    hour_col: str = "hour",
) -> DataFrame:
    """Derive one event-time column from whichever layout each row has.

    The coalesce chain mirrors
    ``spark-apps/05_ingest_electricity_csv.py:34-44``: plain timestamp →
    ISO-8601 with zone suffix (``X`` pattern, trailing ``Z`` tolerated) →
    ``date`` + zero-padded ``hour``. Missing columns contribute NULL
    (literal) branches, so one reader serves every producer version.
    """
    cols = set(df.columns)

    def have(c: str) -> bool:
        return c in cols

    branches: list[Column] = []
    if have(ts_col):
        branches.append(F.to_timestamp(F.col(ts_col)))
    if have(ts_utc_col):
        iso = F.regexp_replace(F.col(ts_utc_col).cast("string"), "Z$", "+0000")
        branches.append(F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]Z"))
        branches.append(F.to_timestamp(F.col(ts_utc_col)))
    if have(date_col) and have(hour_col):
        branches.append(
            F.to_timestamp(
                F.concat_ws(
                    " ",
                    F.col(date_col).cast("string"),
                    F.lpad(F.col(hour_col).cast("string"), 2, "0"),
                ),
                "yyyy-MM-dd HH",
            )
        )
    if not branches:
        raise ValueError(
            f"no recognized timestamp layout among columns {sorted(cols)}"
        )
    return df.withColumn(out_col, F.coalesce(*branches))


def read_landing_csv(
    spark: SparkSession,
    landing_path: str,
    casts: Mapping[str, str],
    dates: Sequence[str] | None = None,
    recursive: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Read a landing zone of headered CSV drops with explicit typing.

    ``casts`` maps column → type for every column that must be typed
    (absent columns are skipped — drift tolerance); everything else stays
    string. ``dates`` restricts the read to ``date=<d>`` subdirectories
    (path-level partition pruning, the notebook's incremental variant
    ``notebooks/05_ingest_electricity_csv.ipynb:202-208``).
    """
    if dates:
        paths = [f"{landing_path.rstrip('/')}/date={d}" for d in dates]
    else:
        paths = [landing_path]
    reader = (
        spark.read.option("header", "true")
        .option("inferSchema", "false")
        .option("sep", sep)
        .option("recursiveFileLookup", "true" if recursive else "false")
    )
    df = reader.csv(list(paths))
    for col, dtype in casts.items():
        if col in df.columns:
            df = df.withColumn(col, F.col(col).cast(dtype))
    return df
