"""Data sources: OSM changeset XML ingest and parquet helpers."""
