"""Double-double (float32 x 2) arithmetic for the fp64 SpMV path.

TPUs have no native fp64 MXU/VPU datapath, so the reference's ``spmv_double``
binary (``main_f64.cu``, ``dasp_f64.h``) maps to an error-free-transformation
emulation: every fp64 value v is carried as a pair of float32s
``(hi, lo)`` with ``hi = f32(v)`` and ``lo = f32(v - hi)``, giving ~48 bits of
effective mantissa — comfortably inside the reference's 1e-5 verification
tolerance (``main_f64.cu:8``).

Algorithms are the classic Dekker/Knuth error-free transforms (TwoSum, Split,
TwoProd) specialized to f32 (split constant 2^12+1).  All functions are
elementwise on jnp arrays and safe inside jit/pallas.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

_SPLIT = np.float32(4097.0)  # 2^12 + 1 for the 24-bit f32 mantissa

Pair = Tuple[jnp.ndarray, jnp.ndarray]


def from_f64(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side split of a float64 numpy array into (hi, lo) float32."""
    hi = x.astype(np.float32)
    lo = (x - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def to_f64(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """Host-side combine back to float64."""
    return np.asarray(hi, dtype=np.float64) + np.asarray(lo, dtype=np.float64)


def two_sum(a, b) -> Pair:
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b) -> Pair:
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    err = b - (s - a)
    return s, err


def split(a) -> Pair:
    t = _SPLIT * a
    hi = t - (t - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b) -> Pair:
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def add(ah, al, bh, bl) -> Pair:
    """(ah, al) + (bh, bl), renormalized."""
    sh, sl = two_sum(ah, bh)
    sl = sl + (al + bl)
    return quick_two_sum(sh, sl)


def mul(ah, al, bh, bl) -> Pair:
    """(ah, al) * (bh, bl), renormalized."""
    ph, pl = two_prod(ah, bh)
    pl = pl + (ah * bl + al * bh)
    return quick_two_sum(ph, pl)


def sum_axis(h: jnp.ndarray, l: jnp.ndarray, axis: int) -> Pair:
    """Exact-compensated reduction along ``axis`` via a pairwise tree of
    dd-adds (log2(n) elementwise passes; n is static)."""
    n = h.shape[axis]
    if n == 1:
        return jnp.squeeze(h, axis), jnp.squeeze(l, axis)
    half = n // 2

    def slc(x, start, size):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(start, start + size)
        return x[tuple(idx)]

    sh, sl = add(slc(h, 0, half), slc(l, 0, half),
                 slc(h, half, half), slc(l, half, half))
    rh, rl = sum_axis(sh, sl, axis)
    if n % 2:
        lh = jnp.squeeze(slc(h, n - 1, 1), axis)
        ll = jnp.squeeze(slc(l, n - 1, 1), axis)
        rh, rl = add(rh, rl, lh, ll)
    return rh, rl
