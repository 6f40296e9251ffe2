"""CREATE STREAM analogs on Structured Streaming (SURVEY §2.10)."""
