"""Object API mirroring the reference classes.

``CMPS`` / ``RhoCMPS`` / ``PsiCMPS`` (reference: model.py:5, model.py:55,
model.py:206) as thin stateful wrappers over the functional core: they own a
parameter pytree + config and expose the same attributes (.loss, .R, .freqs,
.A, .sigma, .rho_0/.psi_0) and methods (sample, *_evolve_with_data,
rho_evolve_with_sampling, purity) so a user of the reference finds the same
surface. Training uses the functional API (see train.py); these wrappers are
for interactive use, diagnostics, and the test suite.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CMPSConfig
from ..ops.complexing import to_numpy
from . import core
from .cell import effective_R
from .params import init_psi, init_rho


class CMPS:
    """Base: owns the learnable physics parameters (reference: model.py:5-52).

    `data_iterator` may be a [B,T] array (single batch — what `.loss` and the
    evolve methods consume, mirroring the reference's captured iterator
    tensor) or any object with shape [B,T].
    """

    def __init__(self, hparams: CMPSConfig, data_iterator=None, freqs_in=None,
                 R_in=None, seed: int = 0, key=None):
        self.cfg = hparams
        self.bond_d = hparams.bond_dim
        self.batch_size = hparams.minibatch_size
        self.h_reg = hparams.h_reg
        self.r_reg = hparams.r_reg
        self.delta_t = hparams.delta_t
        self.sigma = hparams.sigma
        self.data_iterator = data_iterator
        self._key = key if key is not None else jax.random.PRNGKey(seed)
        self._init_params(freqs_in=freqs_in, R_in=R_in)

    def _init_params(self, **kwargs):
        raise NotImplementedError

    # --- reference attribute surface ---------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @property
    def A(self):
        return self.params.A

    @property
    def freqs(self):
        return self.params.freqs

    @property
    def R(self) -> np.ndarray:
        """Effective (zero-diagonal) complex R (reference: model.py:41-42)."""
        Rr, Ri = effective_R(self.params)
        return to_numpy(Rr, Ri)


class RhoCMPS(CMPS):
    """Density-matrix variant (reference: model.py:55-203)."""

    def __init__(self, hparams: CMPSConfig, data_iterator=None, W_in=None,
                 freqs_in=None, R_in=None, seed: int = 0, key=None):
        self._W_in = W_in
        super().__init__(hparams, data_iterator=data_iterator,
                         freqs_in=freqs_in, R_in=R_in, seed=seed, key=key)
        self.rank_rho_0 = (hparams.initial_rank if hparams.initial_rank
                           is not None else hparams.bond_dim)
        if self.data_iterator is not None:
            self.loss = self._compute_loss()

    def _init_params(self, freqs_in=None, R_in=None):
        self.params = init_rho(self._key, self.cfg, freqs_in=freqs_in,
                               R_in=R_in, W_in=self._W_in)

    @property
    def rho_0(self) -> np.ndarray:
        return to_numpy(*core.rho0(self.params, self.cfg))

    def _compute_loss(self):
        data = jnp.asarray(self.data_iterator)
        return jax.jit(core.rho_nll, static_argnums=1)(
            self.params, self.cfg, data)

    def rho_evolve_with_data(self) -> np.ndarray:
        """[B, T-1, D, D] complex trajectory (reference: model.py:76-85)."""
        data = jnp.asarray(self.data_iterator)
        rr, ri = core.rho_evolve_with_data(self.params, self.cfg, data)
        return to_numpy(rr, ri)

    def rho_evolve_with_sampling(self, num_samples: int, length: int,
                                 temp: float = 1.0, key=None) -> np.ndarray:
        """[N, length, D, D] complex trajectory (reference: model.py:87-93)."""
        key = key if key is not None else self._next_key()
        rr, ri = core.rho_evolve_with_sampling(
            self.params, self.cfg, key, num_samples, length, temp)
        return to_numpy(rr, ri)

    def purity(self, num_samples: int, length: int, temp: float = 1.0,
               key=None) -> np.ndarray:
        """[N, length] tr(rho^2) (reference: model.py:95-101)."""
        key = key if key is not None else self._next_key()
        return np.asarray(core.purity(self.params, self.cfg, key,
                                      num_samples, length, temp))

    def sample(self, num_samples: int, length: int, temp: float = 1.0,
               key=None, fused: bool = False) -> np.ndarray:
        """[N, length] waveforms (reference: model.py:103-112).
        `fused=True` runs the Pallas fused SDE kernel (TPU)."""
        key = key if key is not None else self._next_key()
        if fused:
            from ..ops.pallas_scan import rho_sample_pallas_keyed
            return np.asarray(rho_sample_pallas_keyed(
                self.params, self.cfg, key, num_samples, length, temp))
        return np.asarray(core.sample_rho(self.params, self.cfg, key,
                                          num_samples, length, temp))


class PsiCMPS(CMPS):
    """Pure-state variant (reference: model.py:206-334).

    Note: the reference's warm-start path is broken (``psi_in`` triggers a
    NameError on undefined psi_x_in/psi_y_in, model.py:215-216); here it
    works.
    """

    def __init__(self, hparams: CMPSConfig, data_iterator=None, psi_in=None,
                 freqs_in=None, R_in=None, seed: int = 0, key=None):
        self._psi_in = psi_in
        super().__init__(hparams, data_iterator=data_iterator,
                         freqs_in=freqs_in, R_in=R_in, seed=seed, key=key)
        if self.data_iterator is not None:
            self.loss = self._compute_loss()

    def _init_params(self, freqs_in=None, R_in=None):
        self.params = init_psi(self._key, self.cfg, freqs_in=freqs_in,
                               R_in=R_in, psi_in=self._psi_in)

    @property
    def psi_0(self) -> np.ndarray:
        return to_numpy(*core.psi0(self.params, self.cfg))

    def _compute_loss(self):
        data = jnp.asarray(self.data_iterator)
        return jax.jit(core.psi_nll, static_argnums=1)(
            self.params, self.cfg, data)

    def psi_evolve_with_data(self) -> np.ndarray:
        """[B, T-1, D] complex trajectory (reference: model.py:231-240)."""
        data = jnp.asarray(self.data_iterator)
        pr, pi = core.psi_evolve_with_data(self.params, self.cfg, data)
        return to_numpy(pr, pi)

    def sample(self, num_samples: int, length: int, temp: float = 1.0,
               key=None, fused: bool = False) -> np.ndarray:
        """[N, length] waveforms (reference: model.py:242-251).
        `fused=True` runs the Pallas fused SDE kernel (TPU)."""
        key = key if key is not None else self._next_key()
        if fused:
            from ..ops.pallas_scan import psi_sample_pallas_keyed
            return np.asarray(psi_sample_pallas_keyed(
                self.params, self.cfg, key, num_samples, length, temp))
        return np.asarray(core.sample_psi(self.params, self.cfg, key,
                                          num_samples, length, temp))

