"""Ingest sources: batch append writer, schemaless line protocols."""
