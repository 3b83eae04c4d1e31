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
from .wplan import WPlan, build_wplan
from .spmv import SpMVOperator, spmv
from .io import load_matrix, read_mtx, write_mtx

__version__ = "0.1.0"


def verify(csr: CSRMatrix, y, x, rtol: float = 1e-5) -> bool:
    """Element-wise verification against the CPU CSR golden — the enabled
    version of the reference's ``verify_new`` (main_f64.cu:3-16, whose call
    is commented out at :157).  Prints a summary and returns pass/fail."""
    import numpy as np
    golden = csr.spmv(x)
    scale = np.maximum(np.abs(golden), 1.0)
    err = np.abs((np.asarray(y, dtype=np.float64) - golden) / scale)
    ok = bool((err <= rtol).all())
    worst = float(err.max()) if err.size else 0.0
    print(f"Y({csr.n_rows}), compute {'succeed' if ok else 'FAILED'}! "
          f"max rel err {worst:.3e} (tol {rtol:g})")
    return ok


__all__ = [
    "DaspConfig", "DEFAULT_CONFIG", "CSRMatrix", "from_coo", "categorize",
    "RowCategories", "DaspPlan", "build_plan", "WPlan", "build_wplan",
    "SpMVOperator", "spmv", "load_matrix", "read_mtx", "write_mtx",
    "verify", "__version__",
]
