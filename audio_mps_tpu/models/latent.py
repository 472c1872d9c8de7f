"""Latent-conditioned cMPS — the working version of the reference's
``follow_vae.py`` (reference: follow_vae.py — a broken WIP: module-level
``self.bond_d`` NameError at follow_vae.py:53, and a loss fold that never
evolves psi, follow_vae.py:64-67). BASELINE.json configs[3] names this the
"VAE encoder + MPS decoder" variant.

Architecture (what the WIP sketches, made functional and TPU-native):
  - Encoder: framewise waveform statistics -> MLP -> (mu, logvar) of a
    latent z (amortized posterior).
  - Decoder: the cMPS itself; z conditions the initial ancilla state
    psi_0(z) = normalize(MLP(z)) — the reference WIP hardwires a one-hot
    psi_0 (follow_vae.py:57); conditioning it on z is the minimal faithful
    completion of "VAE encoder + MPS decoder".
  - Loss: ELBO = E_q[recon] + beta KL(q || N(0,1)), where recon is either
    the standard cMPS NLL or the WIP's quadratic loss
    ``(signal - <x>)^2 / 2`` (follow_vae.py:69-70), applied per-step to the
    increment vs. the predicted drift <x> dt (the WIP applies it to raw
    samples against a frozen psi, which cannot train).
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from flax import struct

from ..config import CMPSConfig
from . import cell, core
from .cell import make_constants
from .params import CMPSParams, init_common


@struct.dataclass
class LatentCMPSParams(CMPSParams):
    """Shared physics params (A, R, freqs) + encoder/decoder MLPs."""

    # encoder: features -> hidden -> (mu, logvar)
    enc_w1: jnp.ndarray
    enc_b1: jnp.ndarray
    enc_w_mu: jnp.ndarray
    enc_b_mu: jnp.ndarray
    enc_w_lv: jnp.ndarray
    enc_b_lv: jnp.ndarray
    # decoder conditioning: z -> psi_0 (2D real outputs -> complex pair)
    dec_w1: jnp.ndarray
    dec_b1: jnp.ndarray
    dec_w2: jnp.ndarray
    dec_b2: jnp.ndarray


N_FRAMES = 64          # framewise feature resolution
N_STATS = 5            # mean, std, absmax, mean |diff|, zero-cross rate


def init_latent(key, cfg: CMPSConfig, latent_dim: int = 8,
                hidden: int = 128, freqs_in=None, R_in=None
                ) -> LatentCMPSParams:
    d = cfg.bond_dim
    keys = jax.random.split(key, 8)
    common = init_common(keys[0], cfg, freqs_in=freqs_in, R_in=R_in)
    feat = N_FRAMES * N_STATS

    def dense(k, n_in, n_out):
        return (jax.random.normal(k, (n_in, n_out)) * jnp.sqrt(2.0 / n_in),
                jnp.zeros((n_out,)))

    w1, b1 = dense(keys[1], feat, hidden)
    wmu, bmu = dense(keys[2], hidden, latent_dim)
    wlv, blv = dense(keys[3], hidden, latent_dim)
    dw1, db1 = dense(keys[4], latent_dim, hidden)
    dw2, db2 = dense(keys[5], hidden, 2 * d)
    return LatentCMPSParams(
        enc_w1=w1, enc_b1=b1, enc_w_mu=wmu, enc_b_mu=bmu,
        enc_w_lv=wlv, enc_b_lv=blv,
        dec_w1=dw1, dec_b1=db1, dec_w2=dw2, dec_b2=db2,
        **common)


def _features(signals):
    """Framewise stats [B, N_FRAMES * N_STATS] of waveforms [B, T].

    The last two stats carry PITCH: mean |first difference| scales with
    frequency x amplitude and the zero-crossing rate with frequency alone
    — amplitude stats by themselves cannot separate pitches, which the
    latent quality anchor (tools/latent_check.py) requires the posterior
    to do. Both are plain VPU ops (no FFT — complex dtypes are
    unsupported on this TPU backend), and non-smoothness is fine here:
    features are functions of the DATA only, so no gradient flows
    through them (the encoder differentiates w.r.t. its weights)."""
    B, T = signals.shape
    frame = T // N_FRAMES
    if frame < 1:
        raise ValueError(
            f"latent encoder features need T >= {N_FRAMES} samples "
            f"(one per frame), got T={T}")
    x = signals[:, : frame * N_FRAMES].reshape(B, N_FRAMES, frame)
    if frame >= 2:
        dx = x[:, :, 1:] - x[:, :, :-1]
        mad = jnp.abs(dx).mean(-1)
        zcr = 0.5 * jnp.abs(jnp.sign(x[:, :, 1:])
                            - jnp.sign(x[:, :, :-1])).mean(-1)
    else:
        # frame == 1 (N_FRAMES <= T < 2*N_FRAMES): within-frame pairs
        # don't exist — a mean over the empty diff axis is NaN (this
        # NaN'd the whole ELBO). x[:, :, 0] is exactly the decimated
        # signal; use its cross-frame differences, edge-padded back to
        # N_FRAMES columns. frame >= 2 behavior is bit-identical.
        d = x[:, 1:, 0] - x[:, :-1, 0]               # [B, N_FRAMES-1]
        mad = jnp.pad(jnp.abs(d), ((0, 0), (0, 1)), mode="edge")
        zcr = jnp.pad(
            0.5 * jnp.abs(jnp.sign(x[:, 1:, 0]) - jnp.sign(x[:, :-1, 0])),
            ((0, 0), (0, 1)), mode="edge")
    feats = jnp.concatenate(
        [x.mean(-1), x.std(-1), jnp.abs(x).max(-1), mad, zcr], axis=-1)
    return feats


def encode(params: LatentCMPSParams, signals):
    """Amortized posterior q(z | x): returns (mu, logvar) [B, Z]."""
    h = jax.nn.tanh(_features(signals) @ params.enc_w1 + params.enc_b1)
    mu = h @ params.enc_w_mu + params.enc_b_mu
    logvar = h @ params.enc_w_lv + params.enc_b_lv
    return mu, jnp.clip(logvar, -10.0, 10.0)


def decode_psi0(params: LatentCMPSParams, z, cfg: CMPSConfig):
    """z [B, Z] -> normalized per-example psi_0 pair [B, D]."""
    d = cfg.bond_dim
    h = jax.nn.tanh(z @ params.dec_w1 + params.dec_b1)
    out = h @ params.dec_w2 + params.dec_b2
    pr, pi = out[:, :d], out[:, d:]
    return cell.normalize_psi(pr, pi, cfg.norm_eps)


def _psi_quadratic_step(cc, cfg: CMPSConfig, carry, inc):
    """Quadratic reconstruction step (follow_vae.py:69-70 made dynamical):
    loss += (inc/A - <x> dt)^2 / 2 with <x> on the post-update state, then
    the usual evolve/normalize/rotate."""
    pr, pi, loss = carry
    s = inc / cc.A
    pr2, pi2 = cell.psi_apply_update(cc, pr, pi, s)
    e = cell.psi_expectation(cc, pr2, pi2)
    loss = loss + 0.5 * (s - e * cfg.delta_t) ** 2
    pr2, pi2 = cell.normalize_psi(pr2, pi2, cfg.norm_eps)
    pr2, pi2 = cell.rotate_psi(cc, pr2, pi2)
    return (pr2, pi2, loss)


def recon_loss(params: LatentCMPSParams, cfg: CMPSConfig, signals, psi0_pair,
               loss_type: str = "log", fused: bool = False):
    """Per-example reconstruction loss [B] of waveforms under the cMPS
    decoder started from per-example psi_0. `fused=True` (log loss only)
    routes through the fused Pallas forward+backward kernels with
    per-example initial states; the kernel streams true per-example losses
    and its VJP takes per-example cotangents, so any weighting (e.g.
    importance-weighted ELBOs) differentiates correctly."""
    if fused and loss_type != "log":
        raise ValueError("fused recon supports loss_type='log' only")
    if fused and loss_type == "log":
        from ..ops.pallas_grad import psi_nll_pallas_trainable_from_state
        return psi_nll_pallas_trainable_from_state(
            params, cfg, signals, psi0_pair,
            precision=cfg.kernel_precision, reduce="none",
            defer_norm=cfg.defer_norm)
    cc = make_constants(params, cfg)
    incs = (signals[:, 1:] - signals[:, :-1]).T
    B = signals.shape[0]
    pr, pi = psi0_pair
    step_fn = (partial(cell.psi_loss_step, cc, cfg) if loss_type == "log"
               else partial(_psi_quadratic_step, cc, cfg))
    carry = (pr, pi, jnp.zeros((B,), signals.dtype))
    _, _, loss = core.chunked_scan(step_fn, carry, incs, cfg.scan_chunk)
    return loss


def kl_terms(mu, logvar, free_bits: float = 0.0):
    """Per-example KL [B] and the loss-side KL with the per-dimension
    free-bits floor (cfg.latent_free_bits): dims whose KL sits below the
    floor contribute the constant floor instead, removing the gradient
    pressure that collapses the posterior (measured r5: the 4-pitch
    anchor collapses to KL ~0.01 at beta=0.15 without it). Returns
    (kl_true, kl_loss) — aux reporting uses the true KL."""
    kl_i = 0.5 * (mu ** 2 + jnp.exp(logvar) - 1.0 - logvar)
    kl = jnp.sum(kl_i, axis=-1)
    if free_bits > 0.0:
        return kl, jnp.sum(jnp.maximum(kl_i, free_bits), axis=-1)
    return kl, kl


def elbo_loss(params: LatentCMPSParams, cfg: CMPSConfig, signals, key=None,
              beta: float = 1.0, loss_type: str = "log",
              fused: bool = False, eps=None, free_bits=None):
    """Negative ELBO (mean over batch): recon + beta KL.

    Returns (loss, aux dict). `fused=True` uses the Pallas fused
    forward+backward for the reconstruction term (TPU). The posterior
    reparameterization noise comes from `key`, or can be passed directly
    as `eps` [B, Z] (used by the data-parallel step to draw one GLOBAL
    noise tensor and slice the local shard, so sharded training is
    bit-identical to the single-device step)."""
    mu, logvar = encode(params, signals)
    if eps is None:
        if key is None:
            raise ValueError("elbo_loss needs either `key` (to sample the "
                             "reparameterization noise) or explicit `eps`")
        eps = jax.random.normal(key, mu.shape)
    z = mu + jnp.exp(0.5 * logvar) * eps
    psi0_pair = decode_psi0(params, z, cfg)
    recon = recon_loss(params, cfg, signals, psi0_pair, loss_type=loss_type,
                       fused=fused)
    if free_bits is None:          # default from the config the caller
        free_bits = cfg.latent_free_bits   # already hands us (review r5)
    kl, kl_loss = kl_terms(mu, logvar, free_bits)
    loss = jnp.mean(recon + beta * kl_loss)
    return loss, {"recon": jnp.mean(recon), "kl": jnp.mean(kl)}


def _sample_from_psi0(params: LatentCMPSParams, cfg: CMPSConfig, key,
                      psi0_pair, length: int, temp, fused: bool):
    """Run the Euler–Maruyama SDE from per-example initial states — the
    shared tail of both latent samplers (prior and conditional), so the
    noise convention and fused dispatch live in exactly one place."""
    cc = make_constants(params, cfg)
    n = psi0_pair[0].shape[0]
    std = cfg.sigma * jnp.sqrt(jnp.asarray(temp) * cfg.delta_t)
    noise = std * jax.random.normal(key, (length, n), jnp.float32)
    if fused:
        from ..ops.pallas_scan import psi_sample_pallas
        return psi_sample_pallas(params, cfg, noise, psi0_pair=psi0_pair)

    def step(c, zt):
        c2, (inc, _state) = cell.psi_sample_step(cc, cfg, c, zt)
        return c2, inc

    _, incs = jax.lax.scan(step, psi0_pair, noise)
    return cc.A * jnp.cumsum(incs, axis=0).T


def sample_latent_conditional(params: LatentCMPSParams, cfg: CMPSConfig,
                              key, signals, length: int, temp=1.0,
                              fused: bool = False):
    """Generate waveforms CONDITIONED on input examples: encode each
    signal to its posterior mean mu, decode psi_0(mu), and run the SDE
    from there — the latent family's reconstruction-by-generation path
    (one sample per input row). The quality anchor asserts these samples'
    spectral peaks track the conditioning example's pitch
    (tools/latent_check.py)."""
    mu, _ = encode(params, signals)
    psi0_pair = decode_psi0(params, mu, cfg)
    return _sample_from_psi0(params, cfg, key, psi0_pair, length, temp,
                             fused)


def sample_latent(params: LatentCMPSParams, cfg: CMPSConfig, key,
                  num_samples: int, length: int, temp=1.0,
                  fused: bool = False):
    """Generate waveforms from the prior: z ~ N(0,1) -> psi_0(z) -> SDE.

    ``fused=True`` runs the SDE through the fused Pallas sampler kernels
    with the per-example decoded initial states (same semantics, pinned by
    tests/test_latent.py) — generation for the latent family rides the
    same kernel path as rho/psi."""
    kz, kn = jax.random.split(key)
    z = jax.random.normal(kz, (num_samples, params.enc_w_mu.shape[1]))
    psi0_pair = decode_psi0(params, z, cfg)
    return _sample_from_psi0(params, cfg, kn, psi0_pair, length, temp,
                             fused)
