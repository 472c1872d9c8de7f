"""Fused Pallas forward+backward (custom VJP) vs jax.grad of the XLA scan
(interpret mode; the same kernels are TPU-validated by bench)."""
import dataclasses

import jax
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core
from audio_mps_tpu.models.params import init_psi, init_rho
from audio_mps_tpu.ops.pallas_grad import (psi_nll_pallas_trainable,
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
def test_psi_fused_value_and_grads(defer):
    pp = init_psi(jax.random.PRNGKey(3), HP)
    v_ref = float(core.psi_nll(pp, HP, _data()))
    v_pal = float(psi_nll_pallas_trainable(pp, HP, _data(), unroll=16,
                                           interpret=True, defer_norm=defer,
                                           layout="split"))
    np.testing.assert_allclose(v_pal, v_ref, rtol=1e-5, atol=1e-7)
    g_ref = jax.grad(core.psi_nll)(pp, HP, _data())
    g_pal = jax.grad(lambda p: psi_nll_pallas_trainable(
        p, HP, _data(), unroll=16, interpret=True, defer_norm=defer,
        layout="split"))(pp)
    _check_grads(g_ref, g_pal, ["A", "Rx", "Ry", "freqs", "psi_x", "psi_y"])


@pytest.mark.parametrize("rank,defer", [(None, False), (None, True),
                                        (3, False), (3, True)])
def test_rho_fused_value_and_grads(rank, defer):
    hp = dataclasses.replace(HP, initial_rank=rank)
    pp = init_rho(jax.random.PRNGKey(3), hp)
    v_ref = float(core.rho_nll_factor(pp, hp, _data()))
    v_pal = float(rho_nll_pallas_trainable(pp, hp, _data(), unroll=16,
                                           interpret=True, defer_norm=defer,
                                           layout="split"))
    np.testing.assert_allclose(v_pal, v_ref, rtol=1e-5, atol=1e-7)
    g_ref = jax.grad(core.rho_nll_factor)(pp, hp, _data())
    g_pal = jax.grad(lambda p: rho_nll_pallas_trainable(
        p, hp, _data(), unroll=16, interpret=True, defer_norm=defer,
        layout="split"))(pp)
    _check_grads(g_ref, g_pal, ["A", "Rx", "Ry", "freqs", "Wx", "Wy"])


def test_fused_train_step_integration():
    """make_train_step(fused=True) trains in interpret mode on CPU."""
    from audio_mps_tpu.training import init_params_for, make_train_step
    cfg = dataclasses.replace(HP, minibatch_size=2, bond_dim=4)
    params = init_params_for("psi_mps", jax.random.PRNGKey(0), cfg)
    opt, step = make_train_step("psi_mps", cfg, fused=True)
    opt_state = opt.init(params)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 2, 65, cfg.delta_t)
    losses = []
    for _ in range(8):
        params, opt_state, m = step(params, opt_state, batch)
        losses.append(float(m["model_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_kernel_precision_plumbing():
    """cfg.kernel_precision reaches the fused kernels (on CPU interpret
    every precision computes identically, so value equality pins the
    plumbing); invalid values are rejected at config construction."""
    from audio_mps_tpu.training import make_train_step, init_params_for
    cfg_hi = dataclasses.replace(HP, minibatch_size=2, bond_dim=4)
    cfg_bf = dataclasses.replace(cfg_hi, kernel_precision="default")
    batch = damped_sine_batch(jax.random.PRNGKey(1), 2, 65, cfg_hi.delta_t)
    outs = {}
    for name, cfg in [("hi", cfg_hi), ("bf", cfg_bf)]:
        params = init_params_for("psi_mps", jax.random.PRNGKey(0), cfg)
        opt, step = make_train_step("psi_mps", cfg, fused=True)
        _, _, m = step(params, opt.init(params), batch)
        outs[name] = float(m["model_loss"])
    np.testing.assert_allclose(outs["bf"], outs["hi"], rtol=1e-6)

    with pytest.raises(ValueError):
        CMPSConfig(kernel_precision="bf16")
    with pytest.raises(ValueError):
        HP.parse("kernel_precision=defualt")


def test_vmem_ceiling_guard():
    """The fused kernels have a documented VMEM ceiling (VERDICT r2 item
    8): beyond it, auto-selected fused falls back to the chunked XLA scan
    with a warning; an explicit fused=True raises with the remedy."""
    import dataclasses
    from audio_mps_tpu.ops.pallas_grad import (fused_supported,
                                               fused_vmem_bytes)
    from audio_mps_tpu.training import nll_fn_for
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.data import damped_sine_batch

    # the measured-working configs fit (v5e probes, r3): D<=192 full-rank
    # rho at B=8, and D=256 at initial_rank=64 ...
    assert fused_supported(CMPSConfig(bond_dim=64), 8)
    assert fused_supported(CMPSConfig(bond_dim=128), 8)
    assert fused_supported(CMPSConfig(bond_dim=192), 8)
    assert fused_supported(CMPSConfig(bond_dim=256, initial_rank=64), 8)
    # ... and the measured-failing ones are rejected (full-rank D=256 at
    # B=8 crashed the remote compile helper)
    assert not fused_supported(CMPSConfig(bond_dim=256), 8)
    assert not fused_supported(CMPSConfig(bond_dim=512), 8)
    # psi (rank 1) scales far beyond
    assert fused_supported(CMPSConfig(bond_dim=512), 128, rank=1)
    assert fused_vmem_bytes(512, 8 * 512, 2) > fused_vmem_bytes(256, 8 * 256,
                                                                2)

    # D=512 is no longer "beyond everything": the r5 refit guard admits
    # rank chunks there (chip-validated — see test_large_d_frontier_guard),
    # so the no-remedy legs below use D=576, past the measured compile
    # frontier where rank_chunk_for is None.
    cfg = CMPSConfig(bond_dim=576, minibatch_size=8, scan_chunk=0)
    params = init_rho(jax.random.PRNGKey(0), cfg)
    data = damped_sine_batch(jax.random.PRNGKey(1), 8, 2, cfg.delta_t)

    # explicit fused=True -> clear error
    with pytest.raises(ValueError, match="VMEM ceiling"):
        nll_fn_for("rho_mps", fused=True)(params, cfg, data)

    # auto (fused inferred) on a TPU host falls back to the XLA scan with
    # a warning — emulate the TPU selection by patching the platform probe
    import audio_mps_tpu.training as training_mod
    orig = training_mod._on_tpu
    training_mod._on_tpu = lambda: True
    try:
        auto_nll = nll_fn_for("rho_mps", fused=None)
    finally:
        training_mod._on_tpu = orig
    with pytest.warns(UserWarning, match="falling back to the XLA scan"):
        v = auto_nll(params, cfg, data)       # XLA fallback, one step
    assert np.isfinite(float(v))
    np.testing.assert_allclose(
        float(v), float(nll_fn_for("rho_mps", fused=False)(params, cfg,
                                                           data)),
        rtol=1e-6)


def test_beyond_ceiling_precision_gate():
    """Beyond the single-kernel VMEM ceiling (full-rank rho D=256 B=8)
    auto-fused stays on the chunked kernel whenever the streamed-states
    path is viable — measured (tools/rankstream_bench.py, T=16385,
    value+grad): "high" streamed-chunked 2.2x the XLA scan, "highest"
    streamed-chunked 1.06x while NON-streamed is 0.93x. So fp32
    "highest" falls back to XLA only when streaming is unavailable
    (kernel_stream='off' or unaligned lanes). An explicit fused=True
    still forces the chunked kernel in every case."""
    import dataclasses
    import warnings as warnings_mod

    from audio_mps_tpu.data import damped_sine_batch
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.training import nll_fn_for
    import audio_mps_tpu.training as training_mod

    cfg_hi = CMPSConfig(bond_dim=256, minibatch_size=8, scan_chunk=0,
                        kernel_precision="highest")
    cfg_h3 = dataclasses.replace(cfg_hi, kernel_precision="high")
    cfg_off = dataclasses.replace(cfg_hi, kernel_stream="off")
    params = init_rho(jax.random.PRNGKey(0), cfg_hi)
    data = damped_sine_batch(jax.random.PRNGKey(1), 8, 3, cfg_hi.delta_t)
    ref = float(nll_fn_for("rho_mps", fused=False)(params, cfg_hi, data))

    orig = training_mod._on_tpu
    training_mod._on_tpu = lambda: True
    try:
        auto_nll = nll_fn_for("rho_mps", fused=None)
    finally:
        training_mod._on_tpu = orig

    # "highest" with streaming viable (B*chunk = 512 aligned, stream
    # auto): chunked kernel, NO XLA fallback
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        v_hi = float(auto_nll(params, cfg_hi, data))
    assert not [w for w in caught if "XLA scan" in str(w.message)], \
        "highest + viable streaming must use the chunked kernel"
    np.testing.assert_allclose(v_hi, ref, rtol=1e-6)

    # "highest" with kernel_stream='off': XLA fallback with the warning
    with pytest.warns(UserWarning, match="measured slower"):
        v_off = float(auto_nll(params, cfg_off, data))
    np.testing.assert_allclose(v_off, ref, rtol=1e-6)

    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        v_h3 = float(auto_nll(params, cfg_h3, data))
    assert not [w for w in caught if "XLA scan" in str(w.message)], \
        "bf16x3 beyond the ceiling must use the chunked kernel, not XLA"
    np.testing.assert_allclose(v_h3, ref, rtol=1e-3)

    v_exp = float(nll_fn_for("rho_mps", fused=True)(params, cfg_hi, data))
    np.testing.assert_allclose(v_exp, ref, rtol=1e-5)


def test_large_d_frontier_guard():
    """The large-D frontier (r5, chip-measured via tools/bigd_bench.py +
    frontier probes): rank chunking shrinks the LANES but the [2D,2D]
    step constants stay full-D in VMEM, so the guard is the fitted
    real-VMEM model `partials_real_vmem_bytes` plus the measured hard
    cap at D=512. Pins: D=512 admits chunk 32 (compiles and runs on
    chip — the frontier); D=576 admits nothing (compile-helper death
    measured even const-dominated) -> auto falls back to the XLA scan
    with a warning and an explicit fused=True raises; the D-blind auto
    unroll that OOM'd at D=448 cols=32 (unroll 12 -> 109.96M) is
    clamped."""
    import warnings as warnings_mod

    from audio_mps_tpu.data import damped_sine_batch
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.ops.pallas_rank import (partials_unroll,
                                               rank_chunk_for)
    from audio_mps_tpu.training import nll_fn_for
    import audio_mps_tpu.training as training_mod

    # measured frontier picks (see partials_real_vmem_bytes anchors);
    # D=512 B=8 -> 16 is the B=8 flavor, compile-probed ok on chip (r5)
    for D, B, chunk in ((256, 8, 64), (320, 4, 160), (384, 4, 96),
                        (448, 4, 64), (512, 4, 32), (512, 8, 16)):
        cfg_d = CMPSConfig(bond_dim=D, minibatch_size=B)
        assert rank_chunk_for(cfg_d, B, D) == chunk, (D, B)
    # the unroll clamp: auto at D=448 cols=32 stays under the budget
    assert partials_unroll(448, 32, None) <= 7
    assert partials_unroll(64, 512, None) == 5     # small-D unchanged

    cfg = CMPSConfig(bond_dim=576, minibatch_size=4, scan_chunk=0)
    assert rank_chunk_for(cfg, 4, 576) is None

    params = init_rho(jax.random.PRNGKey(0), cfg)
    data = damped_sine_batch(jax.random.PRNGKey(1), 4, 3, cfg.delta_t)
    ref = float(nll_fn_for("rho_mps", fused=False)(params, cfg, data))

    orig = training_mod._on_tpu
    training_mod._on_tpu = lambda: True
    try:
        auto_nll = nll_fn_for("rho_mps", fused=None)
    finally:
        training_mod._on_tpu = orig
    with pytest.warns(UserWarning, match="falling back to the XLA scan"):
        v = float(auto_nll(params, cfg, data))
    np.testing.assert_allclose(v, ref, rtol=1e-6)

    with pytest.raises(ValueError, match="VMEM ceiling"):
        nll_fn_for("rho_mps", fused=True)(params, cfg, data)


def test_lane_misalignment_hint():
    """At D>=128 with a lane count not a multiple of 128 the fused path
    emits the measured-2x perf hint (PSIBATCH_r04.json: B=64 half-fills
    the MXU's 128 lanes AND forces the non-batched, non-streamed
    kernels — 42% vs 92% MFU at D=128); aligned shapes stay silent."""
    import warnings as warnings_mod

    import pytest

    from audio_mps_tpu.config import CMPSConfig
    from audio_mps_tpu.data import damped_sine_batch
    from audio_mps_tpu.models.params import init_psi
    from audio_mps_tpu.training import nll_fn_for

    fn = nll_fn_for("psi_mps", fused=True)
    cfg = CMPSConfig(bond_dim=128, minibatch_size=8, scan_chunk=4)
    params = init_psi(jax.random.PRNGKey(0), cfg)
    data = damped_sine_batch(jax.random.PRNGKey(1), 8, 9, cfg.delta_t)
    with pytest.warns(UserWarning, match="multiple of.*128|128.*lanes"):
        v = float(fn(params, cfg, data))
    assert np.isfinite(v)

    cfg_ok = CMPSConfig(bond_dim=128, minibatch_size=128, scan_chunk=4)
    data_ok = damped_sine_batch(jax.random.PRNGKey(1), 128, 9,
                                cfg_ok.delta_t)
    with warnings_mod.catch_warnings(record=True) as caught:
        warnings_mod.simplefilter("always")
        v_ok = float(fn(params, cfg_ok, data_ok))
    assert not [w for w in caught if "lanes" in str(w.message)]
    assert np.isfinite(v_ok)
