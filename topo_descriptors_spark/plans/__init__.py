"""Execution plans: checkpointed/resumable partitioned runs, lineage
and metrics persistence (SURVEY.md S5/A8)."""
