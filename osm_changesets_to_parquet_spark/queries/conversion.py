"""Conversion-pipeline queries CS0-CS2 (the reference's own surface).

Filled in alongside :mod:`osm_changesets_to_parquet_spark.sources.changesets`.
"""

from __future__ import annotations
