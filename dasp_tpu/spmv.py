"""User-facing SpMV operator.

``SpMVOperator`` is the TPU-native equivalent of the reference's ``spmv_all``
entry (``dasp_f64.h:486``) split into its natural phases: analyze+pack happen
once at construction (host side), the jitted ``__call__`` runs the packed
kernels on device, and the permutation is undone on-chip so callers get y in
original row order (the reference instead returns a permuted Y plus
``order_rid``; see ``main_f64.cu:3-16``).
"""

from __future__ import annotations

import time
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import DaspConfig, DEFAULT_CONFIG
from .plan import DaspPlan, build_plan
from .sparse import CSRMatrix
from .ops import dd
from .ops import xla_backend
from .ops.xla_backend import BF16, F32, F64

DTYPES = (F32, BF16, F64)
_BACKENDS = ("xla", "pallas", "auto")


def _tpu_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class SpMVOperator:
    """Packed SpMV for one matrix: ``y = op(x)``.

    Args:
      csr: host CSR matrix (or a prebuilt DaspPlan).
      dtype: "f32", "bf16" (reference's spmv_half path) or "f64"
        (reference's spmv_double path, run as f32x2 double-double).
      config: packing tunables.
      backend: "xla", "pallas", or "auto" (pallas where supported).

    f64 accuracy note: on production-size plans (past a ~16 MB stream
    floor) the default f64 pipeline trades precision for speed — column
    sums run in plain f32 and the lo value stream stores as bf16 —
    delivering ~1e-7 relative error instead of the full double-double
    ~1e-13 (still far inside the reference's 1e-5 verification contract,
    main_f64.cu:8).  Pass ``config=DaspConfig(strict_f64=True)`` to keep
    the full dd pipeline (e.g. for cg_solve_dd residual floors).
    """

    def __new__(cls, csr, dtype: str = F32,
                config: DaspConfig = DEFAULT_CONFIG, backend: str = "auto"):
        from .wplan import WPlan
        if backend == "pallas" or isinstance(csr, WPlan) or (
                backend == "auto" and isinstance(csr, CSRMatrix)
                and _tpu_available()):
            # a prebuilt WPlan always means the windowed Pallas operator
            # (one pack shared across dtypes; see PallasSpMV.__init__)
            from .ops.pallas_backend import PallasSpMV
            return PallasSpMV(csr, dtype, config)
        return super().__new__(cls)

    def __init__(self, csr: Union[CSRMatrix, DaspPlan], dtype: str = F32,
                 config: DaspConfig = DEFAULT_CONFIG, backend: str = "auto"):
        if dtype not in DTYPES:
            raise ValueError(f"dtype must be one of {DTYPES}")
        if backend not in _BACKENDS:
            raise ValueError(f"backend must be one of {_BACKENDS}")
        t0 = time.perf_counter()
        if isinstance(csr, DaspPlan):
            self.plan = csr
        else:
            self.plan = build_plan(csr, config)
        self.dtype = dtype
        self.backend = backend
        # (the windowed Pallas implementation is dispatched in __new__;
        # reaching here means the XLA executor)
        self._meta, self._arrays = xla_backend.plan_to_arrays(
            self.plan, dtype)
        self._raw_fn = xla_backend.spmv_fn
        self._fn = jax.jit(self._raw_fn, static_argnums=0)
        # Packed streams live on device for the operator's lifetime
        # (the reference uploads once before its timing loop,
        # dasp_f64.h:1239-1278).
        self._arrays = jax.device_put(self._arrays)
        # Mirrors the preprocessing wall-time metric (dasp_f16.h:1444-1446).
        self.preprocess_seconds = time.perf_counter() - t0

    @property
    def n_rows(self) -> int:
        return self.plan.n_rows

    @property
    def n_cols(self) -> int:
        return self.plan.n_cols

    @property
    def nnz(self) -> int:
        return self.plan.nnz

    def _prep_x(self, x):
        if self.dtype == F64:
            if isinstance(x, dict):
                return x
            hi, lo = dd.from_f64(np.asarray(x, dtype=np.float64))
            return dict(hi=jnp.asarray(hi), lo=jnp.asarray(lo))
        want = jnp.bfloat16 if self.dtype == BF16 else jnp.float32
        return jnp.asarray(x).astype(want)

    def device_call(self, x_dev):
        """Raw jitted call: device-format x in, device-format y out
        (hi/lo dict for f64)."""
        return self._fn(self._meta, self._arrays, x_dev)

    def timing_loop(self, iters: int):
        """A jitted function running ``iters`` chained SpMV iterations on
        device in ONE call (the per-call dispatch overhead of a remote/TPU
        runtime would otherwise swamp sub-ms kernels).  Returns
        fn(x_dev) -> y_dev."""
        raw, meta = self._raw_fn, self._meta

        # runtime iteration count: one compile serves every loop length
        # (see PallasSpMV.timing_loop)
        loop = getattr(self, "_loop_jit", None)
        if loop is None:
            @jax.jit
            def loop(arrays, x, it):
                def body(_, x):
                    y = raw(meta, arrays, x)
                    return xla_backend.perturb_x(x, y)
                x = jax.lax.fori_loop(0, it, body, x)
                return raw(meta, arrays, x)
            self._loop_jit = loop

        import jax.numpy as jnp
        it = jnp.int32(iters)
        return lambda x_dev: loop(self._arrays, x_dev, it)

    def perm_in(self, v):
        """Interface parity with PallasSpMV (the XLA executor never
        relabels, so both directions are the identity)."""
        return np.asarray(v)

    perm_out = perm_in

    def matmat(self, X) -> np.ndarray:
        """Multi-vector SpMV, Y = A @ X for X (n_cols, k).  The XLA
        executor loops columns (the Pallas operator has the multi-x
        fast path)."""
        X = np.asarray(X)
        return np.stack([self(X[:, j]) for j in range(X.shape[1])],
                        axis=1)

    def __call__(self, x) -> np.ndarray:
        y = self.device_call(self._prep_x(x))
        if self.dtype == F64:
            return dd.to_f64(np.asarray(y["hi"]), np.asarray(y["lo"]))
        return np.asarray(y)


def spmv(csr: CSRMatrix, x, dtype: str = F32,
         config: DaspConfig = DEFAULT_CONFIG, backend: str = "auto"):
    """One-shot convenience wrapper: pack + run once."""
    return SpMVOperator(csr, dtype=dtype, config=config, backend=backend)(x)
