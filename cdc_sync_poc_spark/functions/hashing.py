"""Canonical change-hash.

The reference computes TWO different hashes for the same event — PL/SQL
hashes a ``|``-delimited subset (FN_GENERATE_HASH,
poc/tobe-oracle/init/04_create_procedures.sql:13-28) while Java hashes
``Map.toString()`` (CdcSyncService.java:309-326). This engine defines ONE
canonical hash (SURVEY.md §2.9):

    sha256( table '|' pk '|' operation '|' canonical-payload )

where the canonical payload renders numerics with a fixed format
(``%.2f``) so the hash is stable across engines and float formatting.
Computed entirely JVM-side with built-in ``sha2`` — no UDF
(the reference's FN_GENERATE_HASH is a per-row PL/SQL call; here it is
one whole-stage-codegen expression over the column batch).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def change_hash(
    table: Column | str, pk: Column, operation: Column, payload_2f: Column
) -> Column:
    """sha256 hex of 'table|pk|operation|payload'."""
    tbl = F.lit(table) if isinstance(table, str) else table
    return F.sha2(
        F.concat_ws("|", tbl, pk.cast("string"), operation, payload_2f), 256
    )
