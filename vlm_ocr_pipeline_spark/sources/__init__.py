"""Sources/sinks: synthetic page generation, page-table IO, checkpoints."""
