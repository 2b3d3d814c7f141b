"""Plan assembly: session config, pipeline DAG, salting, checkpoints."""
