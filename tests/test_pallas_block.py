"""Block-complex fused kernels (ops/pallas_block.py) vs jax.grad of the
XLA scan and vs the split-layout kernels (interpret mode; the same kernels
are TPU-validated by bench)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core
from audio_mps_tpu.models.params import init_psi, init_rho
from audio_mps_tpu.ops.pallas_grad import (psi_nll_pallas_trainable,
                                           psi_nll_pallas_trainable_from_state,
                                           resolve_layout,
                                           rho_nll_pallas_trainable)

HP = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=0)
T = 83    # odd, exercises padding gates in both sweeps


def _data():
    return damped_sine_batch(jax.random.PRNGKey(1), 4, T, HP.delta_t)


def _check_grads(g_ref, g_pal, names):
    for name in names:
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_pal, name))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 1e-4, f"{name}: rel err {rel}"


@pytest.mark.smoke
@pytest.mark.parametrize("defer", [False, True])
def test_psi_block_value_and_grads(defer):
    pp = init_psi(jax.random.PRNGKey(3), HP)
    v_ref = float(core.psi_nll(pp, HP, _data()))
    v_blk = float(psi_nll_pallas_trainable(pp, HP, _data(), unroll=16,
                                           interpret=True, defer_norm=defer,
                                           layout="block"))
    np.testing.assert_allclose(v_blk, v_ref, rtol=1e-5, atol=1e-7)
    g_ref = jax.grad(core.psi_nll)(pp, HP, _data())
    g_blk = jax.grad(lambda p: psi_nll_pallas_trainable(
        p, HP, _data(), unroll=16, interpret=True, defer_norm=defer,
        layout="block"))(pp)
    _check_grads(g_ref, g_blk, ["A", "Rx", "Ry", "freqs", "psi_x", "psi_y"])


@pytest.mark.parametrize("rank,defer", [(3, False), (None, True)])
def test_rho_block_value_and_grads(rank, defer):
    hp = dataclasses.replace(HP, initial_rank=rank)
    pp = init_rho(jax.random.PRNGKey(3), hp)
    v_ref = float(core.rho_nll_factor(pp, hp, _data()))
    v_blk = float(rho_nll_pallas_trainable(pp, hp, _data(), unroll=16,
                                           interpret=True, defer_norm=defer,
                                           layout="block"))
    np.testing.assert_allclose(v_blk, v_ref, rtol=1e-5, atol=1e-7)
    g_ref = jax.grad(core.rho_nll_factor)(pp, hp, _data())
    g_blk = jax.grad(lambda p: rho_nll_pallas_trainable(
        p, hp, _data(), unroll=16, interpret=True, defer_norm=defer,
        layout="block"))(pp)
    _check_grads(g_ref, g_blk, ["A", "Rx", "Ry", "freqs", "Wx", "Wy"])


def test_psi_block_from_state_per_example():
    """Per-example initial states + reduce='none': block == split, and the
    psi0 cotangent flows (the latent model's consumption pattern)."""
    pp = init_psi(jax.random.PRNGKey(3), HP)
    B, D = 4, HP.bond_dim
    pr0 = jax.random.normal(jax.random.PRNGKey(7), (B, D))
    pi0 = jax.random.normal(jax.random.PRNGKey(8), (B, D))
    n = jnp.sqrt(jnp.sum(pr0 ** 2 + pi0 ** 2, 1, keepdims=True))
    pair = (pr0 / n, pi0 / n)
    kw = dict(unroll=16, interpret=True, reduce="none", defer_norm=True)
    l_split = psi_nll_pallas_trainable_from_state(pp, HP, _data(), pair,
                                                  layout="split", **kw)
    l_blk = psi_nll_pallas_trainable_from_state(pp, HP, _data(), pair,
                                                layout="block", **kw)
    assert l_blk.shape == (B,)
    np.testing.assert_allclose(np.asarray(l_blk), np.asarray(l_split),
                               rtol=1e-5, atol=1e-7)

    def wloss(pair, layout):
        # weighted per-example sum -> non-uniform cotangents into the VJP
        w = jnp.asarray([1.0, 2.0, 0.5, 3.0])
        return jnp.sum(w * psi_nll_pallas_trainable_from_state(
            pp, HP, _data(), pair, layout=layout, **kw))

    g_split = jax.grad(wloss)(pair, "split")
    g_blk = jax.grad(wloss)(pair, "block")
    for a, b in zip(g_split, g_blk):
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
            np.abs(np.asarray(a)).max() + 1e-12)
        assert rel < 1e-4, f"psi0 cotangent rel err {rel}"


def test_high_precision_bf16x3_close_to_highest():
    """kernel_precision='high' (hand-rolled 3-pass bf16x3) tracks the fp32
    kernels to ~16-bit-mantissa accuracy — two orders tighter than raw
    bf16 ('default': loss ~1e-3 / grad ~4e-2). Interpret mode emulates the
    same bf16 casts, so the decomposition logic is pinned on CPU."""
    pp = init_psi(jax.random.PRNGKey(3), HP)
    kw = dict(unroll=16, interpret=True, layout="block", defer_norm=True)
    v_hi = float(psi_nll_pallas_trainable(pp, HP, _data(),
                                          precision="highest", **kw))
    v_h3 = float(psi_nll_pallas_trainable(pp, HP, _data(),
                                          precision="high", **kw))
    assert abs(v_h3 - v_hi) / abs(v_hi) < 3e-3
    g_hi = jax.grad(lambda p: psi_nll_pallas_trainable(
        p, HP, _data(), precision="highest", **kw))(pp)
    g_h3 = jax.grad(lambda p: psi_nll_pallas_trainable(
        p, HP, _data(), precision="high", **kw))(pp)
    _names = ["A", "Rx", "Ry", "freqs", "psi_x", "psi_y"]
    for name in _names:
        a = np.asarray(getattr(g_hi, name))
        b = np.asarray(getattr(g_h3, name))
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-12)
        assert rel < 5e-3, f"{name}: rel err {rel}"
    # config guards: 'high' needs the block layout
    with pytest.raises(ValueError):
        CMPSConfig(kernel_precision="high", kernel_layout="split")
    with pytest.raises(ValueError):
        CMPSConfig(kernel_precision="high", bond_dim=6)
    with pytest.raises(ValueError):
        psi_nll_pallas_trainable(pp, HP, _data(), interpret=True,
                                 layout="split", precision="high")


def test_block_samplers_match_split():
    """Block-layout fused SDE samplers == split samplers on identical
    noise (psi and rho incl. low rank); D % 8 != 0 falls back to split."""
    from audio_mps_tpu.ops.pallas_scan import (psi_sample_pallas,
                                               rho_sample_pallas)
    noise = 1e-4 * jax.random.normal(jax.random.PRNGKey(3), (83, 3))
    pp = init_psi(jax.random.PRNGKey(0), HP)
    w_s = np.asarray(psi_sample_pallas(pp, HP, noise, layout="split"))
    w_b = np.asarray(psi_sample_pallas(pp, HP, noise, layout="block"))
    np.testing.assert_allclose(w_b, w_s, rtol=2e-5,
                               atol=2e-6 * np.abs(w_s).max())
    hp = dataclasses.replace(HP, initial_rank=4)
    rp = init_rho(jax.random.PRNGKey(0), hp)
    w_s = np.asarray(rho_sample_pallas(rp, hp, noise, layout="split"))
    w_b = np.asarray(rho_sample_pallas(rp, hp, noise, layout="block"))
    np.testing.assert_allclose(w_b, w_s, rtol=2e-5,
                               atol=2e-6 * np.abs(w_s).max())
    # D=4: trainable block supported, but the samplers need D % 8 == 0 —
    # the dispatch falls back to split even for an EXPLICIT block request
    # (a model trained with kernel_layout="block" must still sample);
    # only a direct block-kernel call raises
    hp4 = dataclasses.replace(HP, bond_dim=4)
    p4 = init_psi(jax.random.PRNGKey(0), hp4)
    assert psi_sample_pallas(p4, hp4, noise).shape == (3, 83)
    assert psi_sample_pallas(p4, hp4, noise, layout="block").shape == (3, 83)
    from audio_mps_tpu.ops.pallas_block import psi_sample_block
    with pytest.raises(ValueError):
        psi_sample_block(p4, hp4, noise)


def test_layout_resolution_and_guards():
    assert resolve_layout(HP) == "block"                   # auto, D=8
    assert resolve_layout(dataclasses.replace(
        HP, bond_dim=2)) == "split"                        # auto, D=2
    assert resolve_layout(HP, "split") == "split"          # explicit wins
    with pytest.raises(ValueError):
        resolve_layout(HP, "mosaic")
    with pytest.raises(ValueError):
        CMPSConfig(bond_dim=6, kernel_layout="block")
    with pytest.raises(ValueError):
        CMPSConfig(kernel_layout="blocky")
    # explicit block on unsupported D raises at call time too
    hp2 = dataclasses.replace(HP, bond_dim=2)
    pp2 = init_psi(jax.random.PRNGKey(0), hp2)
    with pytest.raises(ValueError):
        psi_nll_pallas_trainable(pp2, hp2, _data(), interpret=True,
                                 layout="block")


@pytest.mark.parametrize("defer", [False, True])
def test_forward_only_nll_block_matches_split(defer):
    """Forward-only block NLL dispatch (eval path) == split kernels."""
    from audio_mps_tpu.ops.pallas_scan import psi_nll_pallas, rho_nll_pallas
    pp = init_psi(jax.random.PRNGKey(3), HP)
    vs = float(psi_nll_pallas(pp, HP, _data(), layout="split",
                              defer_norm=defer))
    vb = float(psi_nll_pallas(pp, HP, _data(), layout="block",
                              defer_norm=defer))
    np.testing.assert_allclose(vb, vs, rtol=1e-5, atol=1e-7)
    hp = dataclasses.replace(HP, initial_rank=3)
    rp = init_rho(jax.random.PRNGKey(3), hp)
    vs = float(rho_nll_pallas(rp, hp, _data(), layout="split",
                              defer_norm=defer))
    vb = float(rho_nll_pallas(rp, hp, _data(), layout="block",
                              defer_norm=defer))
    np.testing.assert_allclose(vb, vs, rtol=1e-5, atol=1e-7)


def test_batched_limb_kernels_match_standard():
    """The spine/limbs-split kernels (_make_psi_*_kernel_batched — auto
    path for B % 128 == 0 on TPU) reproduce the standard defer kernels'
    values AND gradients exactly; pinned at small B via the explicit
    batched=True factory knob (interpret mode has no lane-alignment
    constraint)."""
    from audio_mps_tpu.ops.pallas_block import _psi_block_factory
    from audio_mps_tpu.models import core as _core

    cfg = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=0)
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 197, cfg.delta_t)
    pp = init_psi(jax.random.PRNGKey(1), cfg)

    from audio_mps_tpu.models.cell import make_constants
    from audio_mps_tpu.ops.pallas_block import (_psi_block_constants,
                                                _psi_block_t0)
    from audio_mps_tpu.ops.pallas_scan import _pad_rows

    def nll(params, batched):
        cc = make_constants(params, cfg)
        B, T = data.shape
        unroll = 8
        n_steps = T - 1
        n_blocks = max(1, -(-n_steps // unroll))
        incs = (data[:, 1:] - data[:, :-1]).T / cc.A
        se = _pad_rows(incs, n_blocks * unroll)
        ab, bb, rb = _psi_block_constants(cc)
        pr0, pi0 = _core.psi0(params, cfg)
        t0 = _psi_block_t0(cc, jnp.broadcast_to(pr0[:, None], (8, B)),
                           jnp.broadcast_to(pi0[:, None], (8, B)))
        fused = _psi_block_factory(cfg, B, T, unroll, True, "highest",
                                   True, batched)
        return jnp.mean(fused(ab, bb, rb, t0, se))

    v_std = float(nll(pp, False))
    v_bat = float(nll(pp, True))
    np.testing.assert_allclose(v_bat, v_std, rtol=1e-6)
    # reference value: the XLA scan
    np.testing.assert_allclose(v_bat, float(_core.psi_nll(pp, cfg, data)),
                               rtol=3e-4)

    g_std = jax.grad(lambda p: nll(p, False))(pp)
    g_bat = jax.grad(lambda p: nll(p, True))(pp)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_bat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_batched_limb_kernels_match_standard_rho():
    """rho spine/limbs-split kernels == the standard [1,B]-space defer
    kernels (values, all parameter grads, per-step signal cotangents)."""
    from audio_mps_tpu.ops.pallas_block import (_rho_block_constants,
                                                _rho_block_factory,
                                                _rho_block_t0,
                                                _rho_factor_inputs)
    from audio_mps_tpu.models import core as _core
    from audio_mps_tpu.models.cell import make_constants
    from audio_mps_tpu.ops.pallas_scan import _pad_rows

    cfg = CMPSConfig(minibatch_size=3, bond_dim=8, scan_chunk=0,
                     initial_rank=2)
    data = damped_sine_batch(jax.random.PRNGKey(2), 3, 133, cfg.delta_t)
    pp = init_rho(jax.random.PRNGKey(1), cfg)
    rank = 2

    def nll(params, batched):
        cc = make_constants(params, cfg)
        B, T = data.shape
        unroll = 8
        n_blocks = max(1, -(-(T - 1) // unroll))
        t_pad = n_blocks * unroll
        incs = (data[:, 1:] - data[:, :-1]).T / cc.A
        seb = _pad_rows(incs, t_pad)
        se = jnp.repeat(seb, rank, axis=1)
        h0r, h0i, zmat = _rho_factor_inputs(params, cfg, B)
        ab, bb, xb = _rho_block_constants(cc)
        t0 = _rho_block_t0(cc, h0r, h0i)
        fused = _rho_block_factory(cfg, B, T, rank, unroll, True,
                                   "highest", True, batched)
        return fused(ab, bb, xb, t0, se, seb, zmat, zmat.T)

    v_std = float(nll(pp, False))
    v_bat = float(nll(pp, True))
    np.testing.assert_allclose(v_bat, v_std, rtol=1e-6)
    np.testing.assert_allclose(
        v_bat, float(_core.rho_nll_factor(pp, cfg, data)), rtol=3e-4)

    g_std = jax.grad(lambda p: nll(p, False))(pp)
    g_bat = jax.grad(lambda p: nll(p, True))(pp)
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_bat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)

@pytest.mark.parametrize("prec", ["highest", "high"])
def test_streamed_state_kernels_match_defer(prec):
    """The streamed-states kernels (stream=True — the forward writes every
    per-step state to HBM so the backward replaces its serial recompute
    chain with batched GEMMs; auto path on TPU for B % 128 == 0, measured
    1.25-1.34x on v5e) reproduce the defer kernels' values bitwise and
    gradients to accumulation-order tolerance."""
    from audio_mps_tpu.ops.pallas_block import psi_nll_block_trainable

    cfg = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=0)
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 197, cfg.delta_t)
    pp = init_psi(jax.random.PRNGKey(1), cfg)

    def nll(params, stream):
        return psi_nll_block_trainable(params, cfg, data, unroll=8,
                                       interpret=True, precision=prec,
                                       defer_norm=True, stream=stream)

    v_std, g_std = jax.value_and_grad(lambda p: nll(p, False))(pp)
    v_str, g_str = jax.value_and_grad(lambda p: nll(p, True))(pp)
    np.testing.assert_allclose(float(v_str), float(v_std), rtol=1e-6)
    if prec == "highest":
        np.testing.assert_allclose(
            float(v_str), float(core.psi_nll(pp, cfg, data)), rtol=3e-4)
    # bf16x3 sees the batched-vs-per-step accumulation order through its
    # own ~1e-4 rounding (vs scan); fp32 pins tighter
    tol = 5e-6 if prec == "highest" else 2e-5
    for a, b in zip(jax.tree.leaves(g_std), jax.tree.leaves(g_str)):
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
            np.abs(np.asarray(a)).max() + 1e-12)
        assert rel < tol, f"stream grad rel err {rel}"


def test_streamed_state_from_state_per_example():
    """stream=True composes with per-example initial states and
    reduce='none' (the latent family's consumption pattern), including
    non-uniform per-example cotangents through the VJP."""
    from audio_mps_tpu.ops.pallas_block import (
        psi_nll_block_trainable_from_state)

    cfg = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=0)
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 67, cfg.delta_t)
    pp = init_psi(jax.random.PRNGKey(1), cfg)
    B, D = 4, cfg.bond_dim
    pr0 = jax.random.normal(jax.random.PRNGKey(7), (B, D))
    pi0 = jax.random.normal(jax.random.PRNGKey(8), (B, D))
    n = jnp.sqrt(jnp.sum(pr0 ** 2 + pi0 ** 2, 1, keepdims=True))
    pair = (pr0 / n, pi0 / n)
    kw = dict(unroll=8, interpret=True, reduce="none", defer_norm=True)

    l_std = psi_nll_block_trainable_from_state(pp, cfg, data, pair,
                                               stream=False, **kw)
    l_str = psi_nll_block_trainable_from_state(pp, cfg, data, pair,
                                               stream=True, **kw)
    assert l_str.shape == (B,)
    np.testing.assert_allclose(np.asarray(l_str), np.asarray(l_std),
                               rtol=1e-6)

    def wloss(pair, stream):
        w = jnp.asarray([1.0, 2.0, 0.5, 3.0])
        return jnp.sum(w * psi_nll_block_trainable_from_state(
            pp, cfg, data, pair, stream=stream, **kw))

    g_std = jax.grad(wloss)(pair, False)
    g_str = jax.grad(wloss)(pair, True)
    for a, b in zip(g_std, g_str):
        rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
            np.abs(np.asarray(a)).max() + 1e-12)
        assert rel < 5e-6, f"psi0 cotangent rel err {rel}"


def test_lane_padding_exact_and_gated():
    """kernel_pad_lanes: padded lanes (B -> next 128 multiple; dummy
    lanes are zero signals from a zero state, per-example rows sliced
    back) reproduce the unpadded values BITWISE-CLOSE and gradients to
    accumulation tolerance, for both the plain-defer and streamed
    kernels; auto_pad_cols resolves per policy (the pad win IS the
    streamed-kernel unlock — PSIBATCH_r04: D=8 B=8 11.2 ms vs padded
    8.54; D=128 B=64 117.4 vs 90.9)."""
    import dataclasses as dc

    from audio_mps_tpu.ops.pallas_block import (auto_pad_cols,
                                                psi_nll_block_trainable)

    cfg = CMPSConfig(minibatch_size=5, bond_dim=8, scan_chunk=0)
    data = damped_sine_batch(jax.random.PRNGKey(2), 5, 67, cfg.delta_t)
    pp = init_psi(jax.random.PRNGKey(1), cfg)
    cfg_pad = dc.replace(cfg, kernel_pad_lanes="on")
    assert auto_pad_cols(cfg_pad, 5, 67, True, True) == 128
    # auto: no padding under interpret; padding on "TPU" when the padded
    # shape streams; "off" never
    assert auto_pad_cols(cfg, 5, 67, True, True) == 5
    assert auto_pad_cols(cfg, 5, 67, True, False) == 128
    assert auto_pad_cols(cfg, 128, 67, True, False) == 128
    assert auto_pad_cols(dc.replace(cfg, kernel_stream="off"),
                         5, 67, True, False) == 5
    assert auto_pad_cols(dc.replace(cfg, kernel_pad_lanes="off"),
                         5, 67, True, False) == 5
    # beyond the HBM stream budget auto declines to pad
    assert auto_pad_cols(cfg, 5, 2 ** 26, True, False) == 5

    for stream in (False, True):
        def nll(params, c):
            return psi_nll_block_trainable(params, c, data, unroll=8,
                                           interpret=True,
                                           defer_norm=True, stream=stream)

        v0, g0 = jax.value_and_grad(lambda p: nll(p, cfg))(pp)
        v1, g1 = jax.value_and_grad(lambda p: nll(p, cfg_pad))(pp)
        # padding changes auto_unroll (5 -> 128 lanes), which moves the
        # defer block-exit renorm points: ~1e-6 float reordering, not a
        # semantic difference (the arithmetic per example is identical)
        np.testing.assert_allclose(float(v1), float(v0), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
                np.abs(np.asarray(a)).max() + 1e-12)
            assert rel < 2e-5, f"padded grad rel err {rel} (stream={stream})"


def test_lane_padding_rho_rank_exact_and_gated():
    """RHO lane padding pads the purification RANK with zero factor rows
    (auto_pad_rank): zero rows stay exactly zero through the linear
    factor update, so per-example trace/expectation segment sums and the
    loss are unchanged, and the dummy-row W cotangents drop through the
    pad's VJP. Values/grads pinned vs unpadded for plain-defer and
    streamed kernels; policy gates mirror psi's (defer_norm only)."""
    import dataclasses as dc

    from audio_mps_tpu.ops.pallas_block import (auto_pad_rank,
                                                rho_nll_block_trainable)

    cfg = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=0,
                     initial_rank=3)
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 67, cfg.delta_t)
    pp = init_rho(jax.random.PRNGKey(1), cfg)
    cfg_pad = dc.replace(cfg, kernel_pad_lanes="on")
    # B=4, rank=3 -> cols 12; minimal aligned rank is 32 (B*32 = 128)
    assert auto_pad_rank(cfg_pad, 4, 3, 67, True, True) == 32
    assert auto_pad_rank(cfg, 4, 3, 67, True, True) == 3     # auto+interp
    assert auto_pad_rank(cfg, 4, 3, 67, True, False) == 32   # auto+TPU
    assert auto_pad_rank(cfg, 4, 3, 67, False, False) == 3   # non-defer
    assert auto_pad_rank(cfg, 4, 32, 67, True, False) == 32  # aligned
    assert auto_pad_rank(dc.replace(cfg, kernel_pad_lanes="off"),
                         4, 3, 67, True, False) == 3
    assert auto_pad_rank(cfg, 4, 3, 2 ** 26, True, False) == 3  # HBM
    # overshoot guard: non-power-of-2 B where the uniform per-example
    # pad adds MXU lane tiles (B=12 r=8: 96 -> 384 lanes = 1 -> 3
    # tiles) — measured a 1.5-1.8x loss at D>=16 (PADRANK_r04/r05), so
    # auto declines there; at D<=8 the forced pad WINS (0.885x, r5
    # boundary sweep) so auto accepts. "on" always forces.
    assert auto_pad_rank(cfg, 12, 8, 67, True, False) == 32   # D=8: pad
    cfg16 = dc.replace(cfg, bond_dim=16)
    assert auto_pad_rank(cfg16, 12, 8, 67, True, False) == 8  # D=16: no
    assert auto_pad_rank(dc.replace(cfg16, kernel_pad_lanes="on"),
                         12, 8, 67, True, False) == 32
    # the D<=8 acceptance is BOUNDED at the measured 3-padded-tile
    # envelope (review r5): B=67 r=8 would pad 536 -> 8576 lanes
    # (5 -> 67 tiles, 13x the passes) — auto still declines that
    assert auto_pad_rank(cfg, 67, 8, 67, True, False) == 8

    for stream in (False, True):
        def nll(params, c):
            return rho_nll_block_trainable(params, c, data, unroll=8,
                                           interpret=True,
                                           defer_norm=True, stream=stream)

        v0, g0 = jax.value_and_grad(lambda p: nll(p, cfg))(pp)
        v1, g1 = jax.value_and_grad(lambda p: nll(p, cfg_pad))(pp)
        # padding changes auto_unroll -> block-exit renorm points move:
        # float reordering only
        np.testing.assert_allclose(float(v1), float(v0), rtol=2e-5)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            rel = np.abs(np.asarray(a) - np.asarray(b)).max() / (
                np.abs(np.asarray(a)).max() + 1e-12)
            assert rel < 2e-5, f"rho padded grad rel {rel} (stream={stream})"


def test_auto_stream_gate():
    """stream=None resolution: ON only on real TPU (not interpret) with
    defer_norm, lane-aligned B, and a state stream inside the HBM budget;
    explicit stream=True without defer_norm raises."""
    from audio_mps_tpu.ops.pallas_block import (auto_stream,
                                                psi_nll_block_trainable)

    cfg = CMPSConfig(bond_dim=64)
    assert auto_stream(cfg, 128, 16384, True, False)
    assert auto_stream(cfg, 512, 16384, True, False)
    assert not auto_stream(cfg, 128, 16384, True, True)      # interpret
    assert not auto_stream(cfg, 128, 16384, False, False)    # no defer
    assert not auto_stream(cfg, 100, 16384, True, False)     # lane align
    assert not auto_stream(cfg, 1024, 16384, True, False)    # HBM budget
    assert not auto_stream(CMPSConfig(bond_dim=128), 128, 65536,
                           True, False)                      # HBM budget

    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 67,
                             CMPSConfig().delta_t)
    pp = init_psi(jax.random.PRNGKey(1), CMPSConfig(bond_dim=8))
    with pytest.raises(ValueError, match="deferred"):
        psi_nll_block_trainable(pp, CMPSConfig(bond_dim=8), data,
                                interpret=True, defer_norm=False,
                                stream=True)


@pytest.mark.parametrize("prec", ["highest", "high"])
def test_streamed_state_kernels_match_batched_rho(prec):
    """rho streamed-states kernels (stream=True — no recompute spine in
    the backward; auto path on TPU for B*rank % 128 == 0) are BITWISE
    equal to the batched spine/limbs kernels: the arithmetic is
    identical, the states just arrive from the forward's HBM stream
    instead of being recomputed serially."""
    from audio_mps_tpu.models.cell import make_constants
    from audio_mps_tpu.ops.pallas_block import (_rho_block_constants,
                                                _rho_block_factory,
                                                _rho_block_t0,
                                                _rho_factor_inputs,
                                                rho_nll_block_trainable)
    from audio_mps_tpu.ops.pallas_scan import _pad_rows
    from audio_mps_tpu.models import core as _core

    D, B, rank, T = 8, 3, 2, 133
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, initial_rank=rank,
                     scan_chunk=0)
    params = init_rho(jax.random.PRNGKey(0), cfg)
    sig = damped_sine_batch(jax.random.PRNGKey(1), B, T, cfg.delta_t)

    def nll(p, stream):
        cc = make_constants(p, cfg)
        unroll = 8
        n_blocks = max(1, -(-(T - 1) // unroll))
        incs = (sig[:, 1:] - sig[:, :-1]).T / cc.A
        seb = _pad_rows(incs, n_blocks * unroll)
        se = jnp.repeat(seb, rank, axis=1)
        h0r, h0i, zmat = _rho_factor_inputs(p, cfg, B)
        ab, bb, xb = _rho_block_constants(cc)
        t0 = _rho_block_t0(cc, h0r, h0i)
        fused = _rho_block_factory(cfg, B, T, rank, unroll, True, prec,
                                   True, True, stream)
        return fused(ab, bb, xb, t0, se, seb, zmat, zmat.T)

    vb, gb = jax.value_and_grad(lambda p: nll(p, False))(params)
    vs, gs = jax.value_and_grad(lambda p: nll(p, True))(params)
    assert float(vb) == float(vs)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    if prec == "highest":
        np.testing.assert_allclose(
            float(vs), float(_core.rho_nll_factor(params, cfg, sig)),
            rtol=3e-4)
    # the public entry point accepts stream and resolves auto (off under
    # interpret) without changing values
    v_auto = rho_nll_block_trainable(params, cfg, sig, unroll=8,
                                     interpret=True, precision=prec,
                                     defer_norm=True)
    v_str = rho_nll_block_trainable(params, cfg, sig, unroll=8,
                                    interpret=True, precision=prec,
                                    defer_norm=True, stream=True)
    # plumbing check only — stream rides the batched kernels whose bf16x3
    # accumulation order differs from the defer kernel auto picks here
    np.testing.assert_allclose(float(v_str), float(v_auto), rtol=2e-5,
                               atol=5e-6)
