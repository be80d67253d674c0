"""Structured Streaming operators beyond the ingest pipeline.

The reference has no streaming-analytics semantics (SURVEY.md §2.5) — its
pipeline is processing-time batched append. These modules add the standard
event-time toolkit a log-analytics engine needs:

- :mod:`windows` — tumbling/sliding event-time aggregation with watermarks
- :mod:`sessionize` — custom stateful sessionization via
  ``applyInPandasWithState``
"""
