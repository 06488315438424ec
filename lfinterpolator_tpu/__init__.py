"""lfinterpolator_tpu — TPU-native light-field view interpolation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ichlubna/lfInterpolator (CUDA): load a camera-grid light field, synthesize 64
novel views along a trajectory by shift-and-sum weighted blending (expressed
as MXU matmuls), with optional per-pixel focus-map estimation for all-in-focus
rendering.
"""

import os as _os

# Persistent XLA compilation cache: repeated CLI invocations with the same
# shapes skip the (slow) TPU compile. Opt out with LFI_NO_COMPILE_CACHE=1.
if not _os.environ.get("LFI_NO_COMPILE_CACHE"):
    _os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "lfinterpolator_tpu"),
    )

from .core.config import RenderConfig

__version__ = "0.1.0"

__all__ = [
    "RenderConfig",
    "Interpolator",
    "RenderResult",
    "QuiltResult",
    "interpolate",
    "StreamingRenderer",
    "__version__",
]

_LAZY = {
    "Interpolator": ("lfinterpolator_tpu.api", "Interpolator"),
    "RenderResult": ("lfinterpolator_tpu.api", "RenderResult"),
    "QuiltResult": ("lfinterpolator_tpu.api", "QuiltResult"),
    "interpolate": ("lfinterpolator_tpu.api", "interpolate"),
    "StreamingRenderer": ("lfinterpolator_tpu.streaming", "StreamingRenderer"),
}


def __getattr__(name):
    """Lazy top-level exports (importing the package stays jax-free)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
