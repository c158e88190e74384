"""Event-time windowing: batch-checkable plans + Structured Streaming."""
