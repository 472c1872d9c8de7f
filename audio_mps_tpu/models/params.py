"""Learnable parameter pytrees for the cMPS model family.

Mirrors the reference's variable set (reference: model.py:27-52, 62-67,
118-130, 214-222): all complex quantities are stored as real pairs because
(a) optimizers want real leaves and (b) this TPU backend has no complex dtype.

Initialization parity notes:
- R: random init with stddev ``1/sqrt(r_reg)`` per component (the reference
  scales a N(0,1) variable by ``rsqrt(r_reg)``, model.py:36-39).
- The reference then "removes the diagonal" with ``R -= matrix_diag_part(R)``
  (model.py:42) — a broadcasting quirk that actually subtracts the diagonal
  *vector from every row*. The intent (and the only property tested,
  reference tests/test_model.py:19-25) is a zero diagonal, which we implement
  directly: the diagonal of R is gauge and is zeroed at use time.
- freqs: stddev ``1/sqrt(h_reg)`` (model.py:49-50).
- psi_0 / W: TF1's default glorot_uniform for uninitialized get_variable
  (model.py:125-126, 218-219); we use the same fan-based uniform limits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import CMPSConfig


def _glorot_uniform(key, shape):
    """TF1 get_variable default initializer (glorot_uniform) equivalent."""
    if len(shape) == 1:
        fan_in = fan_out = shape[0]
    else:
        fan_in, fan_out = shape[-2], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


@struct.dataclass
class CMPSParams:
    """Shared physics parameters (reference: model.py:5-52).

    Attributes:
      A: trainable signal amplitude scale (scalar, model.py:18-19).
      Rx, Ry: real/imag parts of the D x D measurement operator R
        (model.py:36-41). Stored *with* whatever diagonal; the model zeroes
        the diagonal at use time (see `zero_diag`).
      freqs: length-D diagonal Hamiltonian (model.py:49-50).
    """

    A: jnp.ndarray
    Rx: jnp.ndarray
    Ry: jnp.ndarray
    freqs: jnp.ndarray


@struct.dataclass
class PsiParams(CMPSParams):
    """Pure-state variant adds the initial state (model.py:214-222)."""

    psi_x: jnp.ndarray
    psi_y: jnp.ndarray


@struct.dataclass
class RhoParams(CMPSParams):
    """Mixed-state variant adds the rho_0 factor W (model.py:118-130):
    ``rho_0 = W^dag W / tr(W^dag W)`` with W of shape [initial_rank, D]."""

    Wx: jnp.ndarray
    Wy: jnp.ndarray


def init_common(key, cfg: CMPSConfig, freqs_in=None, R_in=None) -> dict:
    """Initialize the shared parameter leaves.

    `freqs_in` / `R_in` are optional numpy warm starts — the same constructor
    seam the reference exposes (model.py:31-33, 44-46) and that its tests use
    to inject known physics (reference tests/test_model.py:74-77).
    """
    d = cfg.bond_dim
    k_rx, k_ry, k_f = jax.random.split(key, 3)
    if R_in is not None:
        R_in = np.asarray(R_in)
        if R_in.shape != (d, d):
            raise ValueError(f"R_in shape {R_in.shape} != ({d}, {d})")
        Rx = jnp.asarray(R_in.real.astype(np.float32))
        Ry = jnp.asarray(R_in.imag.astype(np.float32))
    else:
        scale = 1.0 / np.sqrt(cfg.r_reg)
        Rx = scale * jax.random.normal(k_rx, (d, d), jnp.float32)
        Ry = scale * jax.random.normal(k_ry, (d, d), jnp.float32)
    if freqs_in is not None:
        freqs_in = np.asarray(freqs_in)
        if freqs_in.shape != (d,):
            raise ValueError(f"freqs_in shape {freqs_in.shape} != ({d},)")
        freqs = jnp.asarray(freqs_in.astype(np.float32))
    else:
        freqs = (1.0 / np.sqrt(cfg.h_reg)) * jax.random.normal(k_f, (d,), jnp.float32)
    return dict(A=jnp.asarray(cfg.A, jnp.float32), Rx=Rx, Ry=Ry, freqs=freqs)


def init_psi(key, cfg: CMPSConfig, freqs_in=None, R_in=None, psi_in=None) -> PsiParams:
    k_c, k_px, k_py = jax.random.split(key, 3)
    common = init_common(k_c, cfg, freqs_in=freqs_in, R_in=R_in)
    if psi_in is not None:
        psi_in = np.asarray(psi_in)
        if psi_in.shape != (cfg.bond_dim,):
            raise ValueError(f"psi_in shape {psi_in.shape} != ({cfg.bond_dim},)")
        psi_x = jnp.asarray(psi_in.real.astype(np.float32))
        psi_y = jnp.asarray(psi_in.imag.astype(np.float32))
    else:
        psi_x = _glorot_uniform(k_px, (cfg.bond_dim,))
        psi_y = _glorot_uniform(k_py, (cfg.bond_dim,))
    return PsiParams(psi_x=psi_x, psi_y=psi_y, **common)


def init_rho(key, cfg: CMPSConfig, freqs_in=None, R_in=None, W_in=None) -> RhoParams:
    k_c, k_wx, k_wy = jax.random.split(key, 3)
    common = init_common(k_c, cfg, freqs_in=freqs_in, R_in=R_in)
    rank = cfg.initial_rank if cfg.initial_rank is not None else cfg.bond_dim
    if W_in is not None:
        W_in = np.asarray(W_in)
        if W_in.shape != (rank, cfg.bond_dim):
            raise ValueError(
                f"W_in shape {W_in.shape} != ({rank}, {cfg.bond_dim})")
        Wx = jnp.asarray(W_in.real.astype(np.float32))
        Wy = jnp.asarray(W_in.imag.astype(np.float32))
    else:
        Wx = _glorot_uniform(k_wx, (rank, cfg.bond_dim))
        Wy = _glorot_uniform(k_wy, (rank, cfg.bond_dim))
    return RhoParams(Wx=Wx, Wy=Wy, **common)
