"""Style-encoder registry.

The reference selects its style backbone by commenting/uncommenting
constructor lines (GAN_word/modules_tro.py:211-219).  Here each backbone is a
flax module registered under a string key; all of them consume the 50-image
per-writer style stack as input channels ``(B, 64, 216, 50)`` and emit a
5-tap pyramid of 512-channel features whose final tap is resized to (8, 27).
"""

from __future__ import annotations

from typing import Callable

_REGISTRY: dict[str, Callable] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls
    return deco


def get_style_encoder(name: str, **kwargs):
    try:
        cls = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown style encoder {name!r}; have {sorted(_REGISTRY)}"
        ) from None
    return cls(**kwargs)


def available() -> list[str]:
    return sorted(_REGISTRY)


# populate the registry
from affganwriting_tpu.models.style_encoders import resnet  # noqa: E402,F401
from affganwriting_tpu.models.style_encoders import cnn  # noqa: E402,F401
from affganwriting_tpu.models.style_encoders import vgg  # noqa: E402,F401
from affganwriting_tpu.models.style_encoders import vit  # noqa: E402,F401
from affganwriting_tpu.models.style_encoders import inception  # noqa: E402,F401
from affganwriting_tpu.models.style_encoders import efficientnet  # noqa: E402,F401
