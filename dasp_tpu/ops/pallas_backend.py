"""Pallas executor (TPU kernels).

Placeholder delegating to the XLA backend; real Mosaic kernels that stage x
in VMEM and stream packed tiles via double-buffered DMA land here.
"""

from __future__ import annotations

from .xla_backend import plan_to_arrays, spmv_fn  # noqa: F401
