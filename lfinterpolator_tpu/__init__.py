"""lfinterpolator_tpu — TPU-native light-field view interpolation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ichlubna/lfInterpolator (CUDA): load a camera-grid light field, synthesize 64
novel views along a trajectory by shift-and-sum weighted blending (expressed
as MXU matmuls), with optional per-pixel focus-map estimation for all-in-focus
rendering.
"""

from .core.config import RenderConfig

__version__ = "0.1.0"

__all__ = ["RenderConfig", "__version__"]
