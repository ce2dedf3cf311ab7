"""JSON config system for the line stack.

Rebuild of line_generation's config conventions (train.py:29-137,
SURVEY.md §5.6): JSON files with nested dicts, ``-a key.path=value`` dotted
overrides (generate.py:116-138), a registry-based dispatch in place of the
reference's ``eval(config['arch'])``, name<->filename agreement checks, and
config snapshots embedded next to checkpoints (core/checkpoint.py already
persists the config with every save).
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Callable

ARCH_REGISTRY: dict[str, Callable] = {}
TRAINER_REGISTRY: dict[str, Callable] = {}


def register_arch(name: str):
    def deco(fn):
        ARCH_REGISTRY[name] = fn
        return fn
    return deco


def register_trainer(name: str):
    def deco(fn):
        TRAINER_REGISTRY[name] = fn
        return fn
    return deco


def load_config(path: str, overrides: list[str] | None = None,
                check_name: bool = True) -> dict:
    with open(path) as f:
        config = json.load(f)
    if check_name and "name" in config:
        stem = os.path.splitext(os.path.basename(path))[0]
        # the reference *requires* cf_<name>.json == config['name']
        # (train.py:124-128); warn-level here, hard data entry errors still
        # surface via the registry lookup
        expected = stem[3:] if stem.startswith("cf_") else stem
        if config["name"] != expected:
            raise ValueError(
                f"config name {config['name']!r} != filename {expected!r}")
    for ov in overrides or []:
        apply_override(config, ov)
    return config


def apply_override(config: dict, override: str) -> None:
    """'trainer.curriculum.0=...' style dotted-path assignment with JSON
    value parsing (generate.py:116-138)."""
    key, _, raw = override.partition("=")
    try:
        value: Any = json.loads(raw)
    except json.JSONDecodeError:
        value = raw
    node = config
    parts = key.split(".")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def merge_resume(config: dict, checkpoint_config: dict) -> dict:
    """Checkpoint-embedded config wins unless the file sets 'override': true
    (train.py:109-120)."""
    if config.get("override"):
        return config
    merged = copy.deepcopy(checkpoint_config)
    merged.update({k: v for k, v in config.items() if k == "override"})
    return merged


def build_arch(config: dict):
    name = config["arch"] if "arch" in config else config["model"]["arch"]
    try:
        return ARCH_REGISTRY[name](config)
    except KeyError:
        raise KeyError(
            f"unknown arch {name!r}; registered: {sorted(ARCH_REGISTRY)}"
        ) from None
