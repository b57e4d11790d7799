"""Checkpoint / resume / lineage for sketch pipelines."""

from .checkpoint import CheckpointedRun, checkpointed_sketch_job

__all__ = ["CheckpointedRun", "checkpointed_sketch_job"]
