from .config import (  # noqa: F401
    PMTConfig,
    DataConfig,
    ModelConfig,
    LossConfig,
    OptimConfig,
    ParallelConfig,
    RunConfig,
    config_from_args,
    output_type_for,
    DATASET_N_LABELS,
    CLASS_NAMES,
    ROSES_FOCAL,
    ROSES_BASELINE,
    CITYSCAPES_IGNORE,
)
from .registry import Registry, MODELS, BACKBONES, SEG_LOSSES  # noqa: F401
