"""Sources: parquet catalog tables (catalog.py) + binary media ingest (media.py)."""
