"""TPU compute-path ops: split-complex algebra and the Pallas fused-scan
kernels (imported lazily by most callers; exposed here for discoverability).
"""
from . import complexing

__all__ = ["complexing", "pallas_scan", "pallas_grad"]


def __getattr__(name):
    # lazy: importing the kernels pulls jax.experimental.pallas
    if name in ("pallas_scan", "pallas_grad"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
