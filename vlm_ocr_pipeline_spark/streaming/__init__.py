"""Structured Streaming tier (SURVEY §2.8).

The reference is batch-only; this is the honest streaming mapping of
its streaming-shaped concepts: incremental per-page checkpoints become
checkpointLocation-tracked file-source micro-batches, and the sliding
60 s RPM/TPM rate window becomes a watermarked window aggregation.
"""
