"""Explicit (name, mode) -> class registries.

The reference resolves model/reader/runner class names with eval()
(src/main.py:164-166); we replace that with explicit registries while
keeping the one-file-per-model authoring ergonomics: a model file calls
@register_model and declares its mode-suffix variants.
"""
from __future__ import annotations

import importlib
from typing import Dict

MODEL_REGISTRY: Dict[str, type] = {}
READER_REGISTRY: Dict[str, type] = {}
RUNNER_REGISTRY: Dict[str, type] = {}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        cls.registered_name = name
        return cls

    return deco


def register_reader(name: str):
    def deco(cls):
        READER_REGISTRY[name] = cls
        return cls

    return deco


def register_runner(name: str):
    def deco(cls):
        RUNNER_REGISTRY[name] = cls
        return cls

    return deco


# Modules that contribute registrations; imported lazily so `import
# rechorus_tpu` stays light.
_MODEL_MODULES = [
    "rechorus_tpu.models.general",
    "rechorus_tpu.models.sequential",
    "rechorus_tpu.models.context",
    "rechorus_tpu.models.context_seq",
    "rechorus_tpu.models.reranker",
    "rechorus_tpu.models.developing",
]


def load_all():
    import rechorus_tpu.data.readers_all  # noqa: F401
    import rechorus_tpu.runners  # noqa: F401

    for mod in _MODEL_MODULES:
        importlib.import_module(mod)


def get_model(name: str, mode: str = ""):
    """Resolve '<Name><Mode>' like the reference's eval of model_name+mode
    (src/main.py:158-164). '' mode = the base class registered as <Name>."""
    load_all()
    key = name + mode
    if key not in MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model '{key}'. Registered: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[key]


def get_reader(name: str):
    load_all()
    return READER_REGISTRY[name]


def get_runner(name: str):
    load_all()
    return RUNNER_REGISTRY[name]
