from affganwriting_tpu.ops.norms import (
    instance_norm,
    adain,
    mean_variance_norm,
    calc_mean_std,
)

__all__ = ["instance_norm", "adain", "mean_variance_norm", "calc_mean_std"]
