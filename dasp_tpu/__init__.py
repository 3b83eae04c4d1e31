"""dasp_tpu — a TPU-native SpMV framework.

A ground-up JAX/XLA/Pallas re-design of the DASP algorithm (SC '23,
SuperScientificSoftwareLaboratory/DASP): histogram rows by nonzero count,
pack each category into dense TPU-tile-shaped fragments, and run dense
multiply-reduce strategies per category — long rows via chunked partials with
a fused reduction tree, medium rows via transposed SELL slices with adaptive
width and spilled tails, short rows via sublane-strided tiles (including the
1+3-nnz pairing trick).

Quick start::

    import dasp_tpu
    csr = dasp_tpu.load_matrix("matrix.mtx")
    op = dasp_tpu.SpMVOperator(csr, dtype="f32")
    y = op(x)
"""

from .config import DaspConfig, DEFAULT_CONFIG
from .sparse import CSRMatrix, from_coo
from .analyze import categorize, RowCategories
from .plan import DaspPlan, build_plan
from .spmv import SpMVOperator, spmv
from .io import load_matrix, read_mtx, write_mtx

__version__ = "0.1.0"

__all__ = [
    "DaspConfig", "DEFAULT_CONFIG", "CSRMatrix", "from_coo", "categorize",
    "RowCategories", "DaspPlan", "build_plan", "SpMVOperator", "spmv",
    "load_matrix", "read_mtx", "write_mtx", "__version__",
]
