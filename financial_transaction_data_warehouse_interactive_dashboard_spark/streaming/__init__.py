"""Event-time windowing: batch-testable window ops + Structured Streaming."""
