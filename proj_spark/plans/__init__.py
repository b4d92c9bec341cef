"""Physical-plan layer: checkpointed stages with per-partition lineage."""

from proj_spark.plans.checkpoint import CheckpointedStage  # noqa: F401
from proj_spark.plans.compaction import compact  # noqa: F401
