"""Pallas TPU kernels for the hot compute paths.

Kernels live here with pure-XLA reference implementations alongside; each is
validated against its reference in interpret mode on CPU and enabled on TPU
via config flags (RenderConfig.use_pallas_raster etc.).
"""

from . import raster_pallas

__all__ = ["raster_pallas"]
