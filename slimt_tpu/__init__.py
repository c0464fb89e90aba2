"""slimt_tpu — a TPU-native quantized machine-translation inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
jerinphilip/slimt (the Bergamot/Marian "tiny student" inference frontend):
INT8 weight-quantized transformer encoder + SSRU decoder models, lexical
shortlists, sentencepiece tokenization, sentence splitting, request
batching, HTML passthrough, pivot translation — designed TPU-first.

Public surface (mirrors the reference umbrella header slimt/slimt.hh:1-5):

    from slimt_tpu import Model, Package, Blocking, Async, Config
"""

__version__ = "0.1.0"

from slimt_tpu.config import Config, ModelConfig, preset  # noqa: F401

_LAZY = {
    "Model": ("slimt_tpu.models.model", "Model"),
    "Package": ("slimt_tpu.models.model", "Package"),
    "Blocking": ("slimt_tpu.runtime.service", "Blocking"),
    "Async": ("slimt_tpu.runtime.service", "Async"),
    "Response": ("slimt_tpu.runtime.response", "Response"),
}


def __getattr__(name):
    # Lazy imports keep `import slimt_tpu` light (no JAX load for
    # IO/text-only users) and avoid import cycles.
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)
