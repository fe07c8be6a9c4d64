"""Runtime services: config tree, logging, checkpointing, profiling.

Replaces the reference's four-layer config sprawl (bash vars +
HfArgumentParser dataclasses + DeepSpeed JSON + per-CLI argparse —
SURVEY.md §5) with one typed config tree serialized into every run dir,
and its dual checkpoint streams (``train/utils/trainer.py:53-118``) with
orbax equivalents.
"""

from pdec.runtime.config import RunConfig, load_config, save_config
from pdec.runtime.logging import ETALogger, get_logger
from pdec.runtime.checkpoint import CheckpointManager

__all__ = [
    "RunConfig",
    "load_config",
    "save_config",
    "ETALogger",
    "get_logger",
    "CheckpointManager",
]
