"""Keyed/salted hashing as native Spark column expressions.

The reference's flagship transform is a per-row Python lambda:
``sha256(salt.encode() + email.encode()).hexdigest()`` applied with
``Series.apply`` (``/root/reference/email_mapping/email_mapping.py:49-51``)
— single-threaded, Python-object-at-a-time. Here the same semantics are a
codegen'd JVM expression (``F.sha2``): vectorized, whole-stage-compiled,
and distributed, i.e. ~orders of magnitude faster per core and shardable
across 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SALT = "odl-etl-salt"


def salted_sha256(col: Column | str, salt: str = DEFAULT_SALT) -> Column:
    """Hex digest of sha256(salt || value) — byte-identical to the
    reference's ``hashlib.sha256(salt + email).hexdigest()``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(F.concat(F.lit(salt), c), 256)


def content_fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: sha256 over the sorted,
    lower-cased token multiset. Two documents with the same bag of words
    (any order/case) collide — the cheap exact-dedup key for text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sha2(
        F.concat_ws(" ", F.array_sort(F.split(F.lower(c), r"\s+"))), 256
    )
