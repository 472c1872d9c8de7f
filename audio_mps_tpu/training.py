"""Training subsystem: jitted Adam step, Orbax checkpoint/resume.

The TPU-native replacement for ``tf.contrib.training.train`` +
``AdamOptimizer`` (reference: train.py:88-94): a donated, jitted
``value_and_grad`` step through the chunked time scan, Optax Adam, and
Orbax checkpointing with the reference's time-based cadence (60 s,
reference: train.py:93) plus restore-on-restart (the reference's managed
session behaviour; SURVEY.md §5 checkpoint/resume).
"""
from __future__ import annotations

import os
import time
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .config import CMPSConfig
from .models import core
from .models.params import init_psi, init_rho


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def nll_fn_for(mps_model: str, fused: Optional[bool] = None):
    """NLL implementation: `fused=None` auto-selects the Pallas fused
    forward+backward kernels on TPU (ops/pallas_grad.py; ~3-6x faster
    training, gradients pinned equal to jax.grad of the scan) and the XLA
    scan elsewhere.

    VMEM ceiling: past the bond dimension where the fused backward no
    longer fits VMEM at minimum unroll (ops/pallas_grad.fused_supported —
    full-rank rho between D=192 and D=256 at B=8 on v5e), the rho family
    stays fused via RANK CHUNKING (ops/pallas_rank.py: VMEM-fitting
    subsets of the purification rank run the partials kernel, combined
    exactly outside); psi past its ceiling — and rho when even one rank
    row doesn't fit — falls back to the chunked-remat XLA scan with a
    warning (an EXPLICIT fused=True raises with the remedy there)."""
    explicit = fused is True
    if fused is None:
        fused = _on_tpu()

    def _guarded(kernel_fn, xla_fn, rank_of, rank_chunked: bool = False):
        def _nll(params, cfg, signals):
            from .ops.pallas_grad import fused_supported
            rank = rank_of(params)
            cols = signals.shape[0] * rank
            if cfg.bond_dim >= 128 and cols % 128 != 0:
                # measured 2x+ penalty (PSIBATCH_r04.json): examples ride
                # the MXU's 128 lanes, so misaligned columns half-fill
                # every pass AND disqualify the batched/streamed kernels.
                # psi auto-pads its lanes where that is measured faster
                # (ops/pallas_block.auto_pad_cols) — no warning then.
                handled = False
                if rank == 1 and not rank_chunked:   # psi family
                    from .ops.pallas_block import (auto_pad_cols,
                                                   supports_block)
                    if supports_block(cfg):
                        handled = auto_pad_cols(
                            cfg, signals.shape[0], signals.shape[1],
                            cfg.defer_norm, not _on_tpu()) % 128 == 0
                elif rank_chunked:                   # rho family
                    from .ops.pallas_block import (auto_pad_rank,
                                                   supports_block)
                    if supports_block(cfg):
                        handled = (signals.shape[0] * auto_pad_rank(
                            cfg, signals.shape[0], rank,
                            signals.shape[1], cfg.defer_norm,
                            not _on_tpu())) % 128 == 0
                    if (supports_block(cfg) and not handled
                            and not fused_supported(cfg, signals.shape[0],
                                                    rank)):
                        # beyond the single-kernel ceiling the monolithic
                        # pad declines, but the chunked partials path
                        # (the kernel that will actually run there) pads
                        # each chunk itself (auto_pad_rank_partials)
                        from .ops.pallas_rank import (
                            auto_pad_rank_partials, rank_chunk_for)
                        chunk = rank_chunk_for(cfg, signals.shape[0],
                                               rank)
                        if chunk is not None:
                            handled = (signals.shape[0]
                                       * auto_pad_rank_partials(
                                           cfg, signals.shape[0], chunk,
                                           not _on_tpu())) % 128 == 0
                import warnings
                if not handled:
                    warnings.warn(
                        f"bond_dim={cfg.bond_dim} with {cols} kernel "
                        f"lanes (B for psi, B*rank for rho) is not a "
                        f"multiple of 128: MXU passes run partly empty "
                        f"and the batched/streamed kernels are "
                        f"unavailable — measured ~2x slower at D=128 "
                        f"(42% vs 92% MFU). Prefer a lane count that is "
                        f"a multiple of 128.")
            if not fused_supported(cfg, signals.shape[0], rank):
                if rank_chunked:
                    # beyond the single-kernel ceiling the rho family
                    # stays FUSED by splitting the purification rank into
                    # VMEM-fitting chunks (ops/pallas_rank.py — the rank
                    # rows evolve independently, so each chunk is exact).
                    # Measured (tools/rankstream_bench.py, D=256
                    # full-rank B=8, T=16385, value+grad): bf16x3 "high"
                    # streamed-chunked is 2.2x the XLA scan; fp32
                    # "highest" streamed-chunked 8084 ms vs XLA 8562
                    # (1.06x) while the NON-streamed chunk is 0.93x —
                    # so auto uses the chunked kernel whenever the
                    # streamed-states path is viable (aligned lanes,
                    # kernel_stream not "off"; auto_time_segment bounds
                    # each segment so its stream fits HBM), and at
                    # "highest" falls back to XLA only when it is not.
                    # An EXPLICIT fused=True still gets the chunked
                    # kernel in every case.
                    from .ops.pallas_block import supports_block
                    from .ops.pallas_rank import (chunked_stream_viable,
                                                  rank_chunk_for,
                                                  rho_nll_rank_chunked)
                    chunk = (rank_chunk_for(cfg, signals.shape[0], rank)
                             if supports_block(cfg) else None)
                    stream_ok = chunk is not None and chunked_stream_viable(
                        cfg, signals.shape[0], chunk)
                    if chunk is not None and (
                            explicit or stream_ok
                            or cfg.kernel_precision != "highest"):
                        return rho_nll_rank_chunked(
                            params, cfg, signals, rank_chunk=chunk,
                            precision=cfg.kernel_precision)
                    if chunk is not None:
                        import warnings
                        warnings.warn(
                            f"bond_dim={cfg.bond_dim} exceeds the fused "
                            f"single-kernel VMEM ceiling and the "
                            f"streamed-states path is unavailable "
                            f"(kernel_stream='off', defer_norm=False, or "
                            f"B*rank_chunk % 128 != 0); using the XLA "
                            f"scan — the NON-"
                            f"streamed chunked kernel is measured slower "
                            f"at kernel_precision='highest' "
                            f"(tools/rankstream_bench.py). fused=True "
                            f"forces the chunked kernel.")
                        return xla_fn(params, cfg, signals)
                msg = (f"fused kernels exceed the VMEM ceiling at "
                       f"bond_dim={cfg.bond_dim}, B={signals.shape[0]}, "
                       f"rank={rank}; shrink minibatch_size/initial_rank "
                       f"or use the chunked XLA path")
                if explicit:
                    raise ValueError(msg)
                import warnings
                warnings.warn(msg + " — falling back to the XLA scan")
                return xla_fn(params, cfg, signals)
            return kernel_fn(params, cfg, signals,
                             precision=cfg.kernel_precision,
                             defer_norm=cfg.defer_norm)
        return _nll

    if mps_model == "rho_mps":
        if fused:
            from .ops.pallas_grad import rho_nll_pallas_trainable
            return _guarded(rho_nll_pallas_trainable, core.rho_nll_factor,
                            lambda p: p.Wx.shape[0], rank_chunked=True)
        # factor evolution: same value as core.rho_nll (pinned by tests),
        # half the matmul FLOPs
        return core.rho_nll_factor
    if mps_model == "psi_mps":
        if fused:
            from .ops.pallas_grad import psi_nll_pallas_trainable
            return _guarded(psi_nll_pallas_trainable, core.psi_nll,
                            lambda p: 1)
        return core.psi_nll
    raise ValueError(f"mps_model must be rho_mps or psi_mps, got {mps_model}")


def init_params_for(mps_model: str, key, cfg: CMPSConfig, **warm):
    if mps_model == "rho_mps":
        return init_rho(key, cfg, **warm)
    if mps_model == "psi_mps":
        return init_psi(key, cfg, **warm)
    if mps_model == "latent":
        from .models.latent import init_latent
        return init_latent(key, cfg, latent_dim=cfg.latent_dim,
                           hidden=cfg.latent_hidden, **warm)
    raise ValueError(
        f"mps_model must be rho_mps, psi_mps, or latent, got {mps_model}")


def make_optimizer(cfg: CMPSConfig):
    """Adam at the reference learning rate (reference: train.py:88-89)."""
    return optax.adam(cfg.learning_rate)


def make_loss_fn(mps_model: str, cfg: CMPSConfig,
                 fused: Optional[bool] = None, nll=None):
    """Total-loss + metrics closure. `nll` overrides the NLL implementation
    (signature nll(params, cfg, batch) -> scalar) — used by the parallel
    strategies so the metrics contract lives in exactly one place."""
    nll = nll or nll_fn_for(mps_model, fused)

    def loss_fn(params, batch):
        model_loss = nll(params, cfg, batch)
        total, (h_sq, r_sq) = core.regularized_loss(model_loss, params, cfg)
        return total, {"model_loss": model_loss, "total_loss": total,
                       "h_l2sqnorm": h_sq, "r_l2sqnorm": r_sq,
                       "A": params.A}
    return loss_fn


def make_latent_loss_fn(cfg: CMPSConfig, fused: Optional[bool] = None):
    """ELBO loss (+ the reference's h/r regularizers) for the
    latent-conditioned variant; loss_fn(params, batch, key=None, eps=None)
    — the key drives the posterior reparameterization sample (or pass the
    noise directly as eps [B, Z]; the DP step does, see
    parallel/data_parallel.py)."""
    from .models import latent as latent_lib
    if fused is None:
        # the fused recon kernel implements the log loss only; quadratic
        # (follow_vae.py:69-70) must use the XLA scan even on TPU
        fused = _on_tpu() and cfg.latent_loss == "log"

    def loss_fn(params, batch, key=None, eps=None):
        nll, aux = latent_lib.elbo_loss(
            params, cfg, batch, key, beta=cfg.latent_beta,
            loss_type=cfg.latent_loss, fused=fused, eps=eps,
            free_bits=cfg.latent_free_bits)
        total, (h_sq, r_sq) = core.regularized_loss(nll, params, cfg)
        return total, {"model_loss": nll, "total_loss": total,
                       "recon": aux["recon"], "kl": aux["kl"],
                       "h_l2sqnorm": h_sq, "r_l2sqnorm": r_sq,
                       "A": params.A}
    return loss_fn


def make_train_step(mps_model: str, cfg: CMPSConfig, optimizer=None,
                    fused: Optional[bool] = None):
    """Returns (optimizer, jitted step). step(params, opt_state, batch) ->
    (params, opt_state, metrics) — except for mps_model="latent", whose
    step takes an extra PRNG key: step(params, opt_state, batch, key).
    `fused=None` auto-selects the Pallas fused kernels on TPU."""
    optimizer = optimizer or make_optimizer(cfg)
    if mps_model == "latent":
        loss_fn = make_latent_loss_fn(cfg, fused)

        @partial(jax.jit, donate_argnums=(0, 1))
        def latent_step(params, opt_state, batch, key):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, batch, key)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        return optimizer, latent_step
    loss_fn = make_loss_fn(mps_model, cfg, fused)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return optimizer, step


# ---------------------------------------------------------------------------
# Checkpointing (Orbax)
# ---------------------------------------------------------------------------

class Checkpointer:
    """Orbax-backed checkpoint/resume of (params, opt_state, step).

    Time-based save cadence mirrors the reference's
    ``save_checkpoint_secs=60`` (reference: train.py:93). Saves run
    ASYNCHRONOUSLY (SURVEY.md §5 plan: "Orbax async checkpointing"):
    ``maybe_save`` hands the host copy to a background thread and returns,
    so the step loop never stalls on checkpoint IO; restore/close join any
    in-flight save first.
    """

    def __init__(self, directory: str, save_secs: float = 60.0,
                 max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True))
        self.save_secs = save_secs
        self._last_save = time.time()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, params, opt_state) -> Tuple[object, object, int]:
        """Restore the latest checkpoint into the given (abstract or
        concrete) param/opt_state structures; returns (params, opt_state,
        step). If no checkpoint exists, returns inputs and step 0."""
        self.manager.wait_until_finished()  # join any in-flight save
        step = self.manager.latest_step()
        if step is None:
            return params, opt_state, 0
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            {"params": params, "opt_state": opt_state})
        restored = self.manager.restore(
            step, args=self._ocp.args.StandardRestore(abstract))
        return restored["params"], restored["opt_state"], step

    def maybe_save(self, step: int, params, opt_state, force: bool = False):
        """Kick off a background save if the cadence elapsed (returns
        immediately — orbax snapshots to host and serializes off-thread; a
        save issued while one is in flight joins the previous one first)."""
        now = time.time()
        if force or (now - self._last_save) >= self.save_secs:
            self.manager.save(step, args=self._ocp.args.StandardSave(
                {"params": params, "opt_state": opt_state}))
            self._last_save = now
            return True
        return False

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
