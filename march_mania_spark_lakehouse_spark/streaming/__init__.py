"""Event-time processing: batch windowed aggregation (E6) and a
Structured Streaming wrapper sharing the same transformation logic."""
