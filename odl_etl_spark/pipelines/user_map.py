"""The user-map pipeline: the reference's ``email_mapping`` end-to-end.

Reference flow (``email_mapping/email_mapping.py``): JDBC scan of
(username, email) ``:43-48`` → per-row salted SHA-256 ``:49-51`` → local
Parquet ``:53-54`` → s3fs upload ``:56-68``. Whole result in driver RAM,
single-threaded hash loop, manual upload.

Spark-native flow: any source DataFrame → codegen'd ``salted_sha256``
projection → direct (optionally date-partitioned) Parquet write to the
destination filesystem. No driver materialization, no staging file, and
the hash is byte-identical to the reference's
``sha256(salt + value).hexdigest()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from odl_etl_spark.functions.hashing import salted_sha256
from odl_etl_spark.io.sinks import partitioned_write


def build_user_map(
    users: DataFrame,
    key_col: str = "username",
    email_col: str = "email",
    salt: str = "",
) -> DataFrame:
    """(key, hashed email) projection — the reference's transform,
    distributed. Extra columns are dropped (the reference projects in
    SQL; we let Catalyst prune to exactly these two)."""
    return users.select(
        F.col(key_col), salted_sha256(email_col, salt).alias("hashed_email")
    )


def run_user_map(
    users: DataFrame,
    out_path: str,
    key_col: str = "username",
    email_col: str = "email",
    salt: str = "",
    ds: str | None = None,
) -> int:
    """Full pipeline; returns the row count written.

    With ``ds`` the output lands date-partitioned (``.../ds=<ds>/``) under
    dynamic overwrite — re-running a day replaces that day only, the
    behavior the reference approximated with per-day S3 prefixes.
    """
    mapped = build_user_map(users, key_col, email_col, salt)
    if ds is not None:
        partitioned_write(mapped.withColumn("ds", F.lit(ds)), out_path, ("ds",))
    else:
        mapped.write.mode("overwrite").parquet(out_path)
    return mapped.count()
