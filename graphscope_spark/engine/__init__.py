from graphscope_spark.engine.checkpoint import CheckpointManager
from graphscope_spark.engine.superstep import SuperstepResult, run_supersteps

__all__ = ["CheckpointManager", "SuperstepResult", "run_supersteps"]
