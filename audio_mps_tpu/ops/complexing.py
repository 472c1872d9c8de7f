"""Split real/imaginary complex linear algebra.

The TPU backend in this environment does not support complex dtypes at all
(device transfer of complex64 raises UNIMPLEMENTED), and even where XLA does
support complex, the MXU consumes real matmuls. So the entire compute path
represents a complex tensor ``z`` as a pair ``(z.re, z.im)`` of real arrays,
exactly as the reference already stores its *trainable* parameters
(reference: model.py:31-41 keeps Rx/Ry, Wx/Wy, psi_x/psi_y as separate real
variables because TF optimizers cannot train complex variables).

Convention: a "cpair" is a tuple ``(re, im)`` of equal-shape float arrays.
"""
from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

# TPU fp32 matmuls default to bfloat16 MXU passes, which visibly breaks the
# physics invariants (Hermiticity / trace preservation drift to ~1e-2 over a
# few hundred recursive steps). The cMPS recursion is latency-bound at these
# tiny shapes, so full-precision passes are essentially free — pin HIGHEST.
_mm = partial(jnp.matmul, precision="highest")


def cpair(z) -> tuple:
    """Split a numpy/complex array into a (re, im) pair of jnp arrays."""
    z = np.asarray(z)
    return jnp.asarray(z.real.astype(np.float32)), jnp.asarray(z.imag.astype(np.float32))


def to_numpy(re, im) -> np.ndarray:
    """Join a cpair back into a numpy complex64 array (host side)."""
    return np.asarray(re).astype(np.complex64) + 1j * np.asarray(im).astype(np.complex64)


def cmul(ar, ai, br, bi):
    """Elementwise complex multiply: (a*b).re, (a*b).im."""
    return ar * br - ai * bi, ar * bi + ai * br


def cconj(ar, ai):
    return ar, -ai


def cabs2(ar, ai):
    return ar * ar + ai * ai


def cmatmul(ar, ai, br, bi):
    """Complex matmul of cpairs using 4 real matmuls.

    Works for any shapes ``jnp.matmul`` accepts (incl. batched leading dims).
    """
    return _mm(ar, br) - _mm(ai, bi), _mm(ar, bi) + _mm(ai, br)


def cmatmul_adj_right(ar, ai, br, bi):
    """``A @ B^dagger`` for cpairs: B^dagger = conj(B)^T."""
    bt_r = jnp.swapaxes(br, -1, -2)
    bt_i = -jnp.swapaxes(bi, -1, -2)
    return _mm(ar, bt_r) - _mm(ai, bt_i), _mm(ar, bt_i) + _mm(ai, bt_r)


def cadjoint(ar, ai):
    """Conjugate transpose of the last two axes."""
    return jnp.swapaxes(ar, -1, -2), -jnp.swapaxes(ai, -1, -2)


def ctrace_re(ar):
    """Real part of the trace only needs the real part of the matrix."""
    return jnp.trace(ar, axis1=-2, axis2=-1)


def gram_adj(ar, ai):
    """``A^dagger @ A`` for a cpair (the R^dag R appearing in the one-step
    evolution operator, reference: model.py:180, model.py:310)."""
    at_r, at_i = cadjoint(ar, ai)
    return cmatmul(at_r, at_i, ar, ai)


def apply_matrix(mr, mi, vr, vi):
    """Apply matrix M [D,D] to a batch of row-vectors v [..., D]: (M v)_a =
    sum_b M_ab v_b, i.e. ``v @ M^T`` in row-vector form."""
    mt_r = mr.T
    mt_i = mi.T
    return _mm(vr, mt_r) - _mm(vi, mt_i), _mm(vr, mt_i) + _mm(vi, mt_r)
