#!/usr/bin/env python
"""Conjugate-gradient solve with dasp_tpu — the canonical SpMV consumer.

Solves A x = b for a symmetric positive-definite A, keeping the whole
iteration on-device: the packed SpMV is jitted together with the CG vector
updates, so one `solve` call runs every iteration without host round trips.

Usage: python examples/cg_solver.py [n]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))


def build_spd(n: int, rng) -> "dasp_tpu.CSRMatrix":
    """A = tridiagonal-ish SPD matrix (2D-Laplacian flavored)."""
    import dasp_tpu
    rows, cols, vals = [], [], []
    for off, v in ((0, 4.0), (1, -1.0), (-1, -1.0), (64, -1.0), (-64, -1.0)):
        r = np.arange(max(0, -off), min(n, n - off))
        rows.append(r)
        cols.append(r + off)
        vals.append(np.full(r.size, v))
    return dasp_tpu.from_coo(n, n, np.concatenate(rows),
                             np.concatenate(cols).astype(np.int32),
                             np.concatenate(vals), sum_duplicates=True)


def cg_solve(op, b: np.ndarray, tol: float = 1e-6, maxiter: int = 500):
    """CG on-device: op is a PallasSpMV/SpMVOperator (f32)."""
    import jax
    import jax.numpy as jnp
    from dasp_tpu.ops.pallas_backend import spmv_fn, prep_x

    meta, arrays = op._meta, op._arrays
    n = op.n_rows

    def matvec(x_flat):
        # re-lay x into the (s_rows,128) table shape on device
        pad = meta.s_rows * 128 - n
        x2d = jnp.concatenate([x_flat, jnp.zeros(pad, jnp.float32)])
        return spmv_fn(meta, arrays, x2d.reshape(meta.s_rows, 128))

    @jax.jit
    def solve(b):
        def body(state):
            x, r, p, rs, it = state
            ap = matvec(p)
            alpha = rs / jnp.dot(p, ap)
            x = x + alpha * p
            r = r - alpha * ap
            rs_new = jnp.dot(r, r)
            p = r + (rs_new / rs) * p
            return x, r, p, rs_new, it + 1

        def cond(state):
            _, _, _, rs, it = state
            return (rs > tol * tol) & (it < maxiter)

        x0 = jnp.zeros_like(b)
        state = (x0, b, b, jnp.dot(b, b), 0)
        x, r, _, rs, it = jax.lax.while_loop(cond, body, state)
        return x, jnp.sqrt(rs), it

    # run in the operator's internal index space (symmetric relabel keeps
    # x and y in one space; CG's dot products are permutation-invariant),
    # encode b on entry / decode x on exit
    b_int = op.perm_in(np.asarray(b, dtype=np.float32))
    x, res, it = solve(jnp.asarray(b_int))
    return op.perm_out(np.asarray(x)), res, it


def main():
    import jax.numpy as jnp  # noqa: F401  (import check)
    import dasp_tpu

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.default_rng(0)
    csr = build_spd(n, rng)
    op = dasp_tpu.SpMVOperator(csr, dtype="f32", backend="pallas")
    x_true = rng.standard_normal(n)
    b = csr.spmv(x_true).astype(np.float32)

    x, res, iters = cg_solve(op, b)
    x = np.asarray(x, dtype=np.float64)
    err = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    print(f"CG: n={n} iters={int(iters)} residual={float(res):.3e} "
          f"solution rel err={err:.3e}")
    return 0 if err < 1e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
