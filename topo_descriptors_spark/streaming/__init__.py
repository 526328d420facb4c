"""Structured Streaming forms of the engine's stateful semantics.

The north rule is batch (SURVEY.md §2.9) — these exist to show the
streaming recast of the same semantics: session windows with watermarked
late-data handling, and incremental per-entity feature aggregates.
"""
