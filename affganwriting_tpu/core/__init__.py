from affganwriting_tpu.core.config import (
    WordGanConfig,
    VOCAB,
    default_config,
)
from affganwriting_tpu.core.dtypes import DtypePolicy

__all__ = ["WordGanConfig", "VOCAB", "default_config", "DtypePolicy"]
