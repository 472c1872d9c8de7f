"""Data-parallel tests on the virtual 8-device CPU mesh (conftest.py):
sharded step must agree with the single-device step exactly (same global
batch, pmean of shard losses == mean over batch)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.parallel import (make_dp_sample, make_dp_train_step,
                                    make_mesh, replicate, shard_batch)
from audio_mps_tpu.training import (init_params_for, make_train_step)

CFG = CMPSConfig(minibatch_size=8, bond_dim=4, scan_chunk=64)
T = 256


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.smoke
@pytest.mark.parametrize("mps_model", ["psi_mps", "rho_mps"])
def test_dp_step_matches_single_device(mps_model):
    mesh = make_mesh()
    params = init_params_for(mps_model, jax.random.PRNGKey(0), CFG)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 8, T, CFG.delta_t)

    opt_s, step_s = make_train_step(mps_model, CFG)
    p1, o1, m1 = step_s(params, opt_s.init(params), batch)

    opt_d, step_d = make_dp_train_step(mps_model, CFG, mesh)
    params_r = replicate(init_params_for(mps_model, jax.random.PRNGKey(0),
                                         CFG), mesh)
    o_d = replicate(opt_d.init(params_r), mesh)
    p2, o2, m2 = step_d(params_r, o_d, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["model_loss"]),
                               float(m2["model_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mps_model", ["psi_mps", "rho_mps"])
def test_dp_fused_step_matches_single_device_fused(mps_model):
    """The fused Pallas custom-VJP kernels inside shard_map (interpret mode
    on the CPU mesh) must reproduce the single-device fused step — this is
    the multi-chip default on TPU (VERDICT r1 item 2)."""
    mesh = make_mesh()
    batch = damped_sine_batch(jax.random.PRNGKey(1), 8, 128, CFG.delta_t)

    opt_s, step_s = make_train_step(mps_model, CFG, fused=True)
    params = init_params_for(mps_model, jax.random.PRNGKey(0), CFG)
    p1, o1, m1 = step_s(params, opt_s.init(params), batch)

    opt_d, step_d = make_dp_train_step(mps_model, CFG, mesh, fused=True)
    params_r = replicate(init_params_for(mps_model, jax.random.PRNGKey(0),
                                         CFG), mesh)
    o_d = replicate(opt_d.init(params_r), mesh)
    p2, o2, m2 = step_d(params_r, o_d, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["model_loss"]),
                               float(m2["model_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dp_fused_step_with_lane_padding_matches_unpadded():
    """Lane padding composes with data parallelism: on a real TPU mesh
    each shard pads its LOCAL columns (kernel_pad_lanes resolves inside
    shard_map, where B is the per-device batch), so the padded DP step
    must reproduce the unpadded single-device step. Pinned here with
    kernel_pad_lanes='on' under interpret (local B=1 -> 128 lanes per
    shard) vs the unpadded single-device fused step."""
    mesh = make_mesh()
    cfg_pad = dataclasses.replace(CFG, kernel_pad_lanes="on")
    batch = damped_sine_batch(jax.random.PRNGKey(1), 8, 65, CFG.delta_t)

    opt_s, step_s = make_train_step("psi_mps", CFG, fused=True)
    params = init_params_for("psi_mps", jax.random.PRNGKey(0), CFG)
    p1, o1, m1 = step_s(params, opt_s.init(params), batch)

    opt_d, step_d = make_dp_train_step("psi_mps", cfg_pad, mesh,
                                       fused=True)
    params_r = replicate(init_params_for("psi_mps", jax.random.PRNGKey(0),
                                         CFG), mesh)
    o_d = replicate(opt_d.init(params_r), mesh)
    p2, o2, m2 = step_d(params_r, o_d, shard_batch(batch, mesh))

    np.testing.assert_allclose(float(m1["model_loss"]),
                               float(m2["model_loss"]), rtol=2e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dp_latent_step_matches_single_device():
    """The latent (VAE encoder + MPS decoder) family trains data-parallel:
    the sharded ELBO step with a replicated key reproduces the
    single-device latent step exactly (the reparameterization noise is
    drawn globally and sliced per shard) — VERDICT r2 item 3."""
    mesh = make_mesh()
    cfg = dataclasses.replace(CFG, latent_dim=4, latent_hidden=16)
    params = init_params_for("latent", jax.random.PRNGKey(0), cfg)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 8, T, cfg.delta_t)
    key = jax.random.PRNGKey(9)

    opt_s, step_s = make_train_step("latent", cfg)
    p1, o1, m1 = step_s(params, opt_s.init(params), batch, key)

    opt_d, step_d = make_dp_train_step("latent", cfg, mesh)
    params_r = replicate(init_params_for("latent", jax.random.PRNGKey(0),
                                         cfg), mesh)
    o_d = replicate(opt_d.init(params_r), mesh)
    p2, o2, m2 = step_d(params_r, o_d, shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(m1["model_loss"]),
                               float(m2["model_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["kl"]), float(m2["kl"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_dp_sample_latent_sharded():
    """Prior sampling for the latent family shards across the mesh like
    the other two families."""
    mesh = make_mesh()
    cfg = dataclasses.replace(CFG, latent_dim=4, latent_hidden=16)
    params = init_params_for("latent", jax.random.PRNGKey(0), cfg)
    build = make_dp_sample("latent", cfg, mesh)
    waves = build(num_samples=8, length=64)(replicate(params, mesh),
                                            jax.random.PRNGKey(5))
    w = np.asarray(waves)
    assert w.shape == (8, 64) and np.isfinite(w).all()
    assert not np.allclose(w[0], w[1])


def test_dp_multi_step_stays_replicated():
    mesh = make_mesh()
    mps_model = "psi_mps"
    opt, step = make_dp_train_step(mps_model, CFG, mesh)
    params = replicate(init_params_for(mps_model, jax.random.PRNGKey(0), CFG),
                       mesh)
    opt_state = replicate(opt.init(params), mesh)
    for i in range(3):
        batch = shard_batch(damped_sine_batch(jax.random.PRNGKey(i), 8, T,
                                              CFG.delta_t), mesh)
        params, opt_state, metrics = step(params, opt_state, batch)
    assert np.isfinite(float(metrics["model_loss"]))


def test_dp_sample_sharded():
    mesh = make_mesh()
    params = init_params_for("rho_mps", jax.random.PRNGKey(0), CFG)
    build = make_dp_sample("rho_mps", CFG, mesh)
    fn = build(num_samples=8, length=64)
    waves = fn(replicate(params, mesh), jax.random.PRNGKey(5))
    assert waves.shape == (8, 64)
    w = np.asarray(waves)
    assert np.isfinite(w).all()
    # different shards used different fold_in keys -> distinct noise
    assert not np.allclose(w[0], w[1])

    with pytest.raises(ValueError):
        build(num_samples=3, length=64)


def test_time_pipeline_matches_single_device():
    """Temporal pipeline parallelism: NLL over an S-stage time mesh must
    equal the plain single-device scan."""
    from audio_mps_tpu.parallel.time_pipeline import (make_time_mesh,
                                                      psi_nll_pipelined,
                                                      rho_nll_pipelined)
    import dataclasses
    from audio_mps_tpu.models.params import init_psi, init_rho
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=8, scan_chunk=0)
    T = 8 * 32 + 1          # T-1 divisible by 8 stages
    data = damped_sine_batch(jax.random.PRNGKey(2), 8, T, cfg.delta_t)
    mesh = make_time_mesh(8)

    pp = init_psi(jax.random.PRNGKey(0), cfg)
    ref = float(_core.psi_nll(pp, cfg, data))
    pipe = float(psi_nll_pipelined(pp, cfg, data, mesh, num_microbatches=4))
    np.testing.assert_allclose(pipe, ref, rtol=1e-5)

    pr = init_rho(jax.random.PRNGKey(1), cfg)
    ref = float(_core.rho_nll_factor(pr, cfg, data))
    pipe = float(rho_nll_pipelined(pr, cfg, data, mesh, num_microbatches=2))
    np.testing.assert_allclose(pipe, ref, rtol=1e-5)


def test_time_pipeline_gradients():
    from audio_mps_tpu.parallel.time_pipeline import (make_time_mesh,
                                                      psi_nll_pipelined)
    import dataclasses
    from audio_mps_tpu.models.params import init_psi
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T = 4 * 16 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)
    mesh = make_time_mesh(4)
    pp = init_psi(jax.random.PRNGKey(0), cfg)
    g_ref = jax.grad(_core.psi_nll)(pp, cfg, data)
    g_pipe = jax.jit(jax.grad(
        lambda p: psi_nll_pipelined(p, cfg, data, mesh,
                                    num_microbatches=2)))(pp)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pipe)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-6)


def test_time_sharded_pscan_matches_single_device():
    """Cross-chip time-sharded NLL (blockwise sequence parallelism) ==
    sequential factor scan, values and gradients."""
    from audio_mps_tpu.parallel.time_pscan import rho_nll_time_sharded
    from audio_mps_tpu.parallel.time_pipeline import make_time_mesh
    import dataclasses
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T = 8 * 32 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)
    mesh = make_time_mesh(8)
    pr = init_rho(jax.random.PRNGKey(1), cfg)
    ref = float(_core.rho_nll_factor(pr, cfg, data))
    v = float(jax.jit(lambda p: rho_nll_time_sharded(p, cfg, data, mesh))(pr))
    # atol: the mean NLL at this tiny fixture is ~-0.003 (near zero), so a
    # pure rtol turns reduction-order fp noise into a failure
    np.testing.assert_allclose(v, ref, rtol=1e-5, atol=1e-7)

    g_ref = jax.grad(_core.rho_nll_factor)(pr, cfg, data)
    g_sh = jax.jit(jax.grad(
        lambda p: rho_nll_time_sharded(p, cfg, data, mesh)))(pr)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_time_sharded_pscan_indivisible_raises():
    from audio_mps_tpu.parallel.time_pscan import rho_nll_time_sharded
    from audio_mps_tpu.parallel.time_pipeline import make_time_mesh
    from audio_mps_tpu.models.params import init_rho
    mesh = make_time_mesh(8)
    pr = init_rho(jax.random.PRNGKey(1), CFG)
    data = damped_sine_batch(jax.random.PRNGKey(2), 8, 200, CFG.delta_t)
    with pytest.raises(ValueError):
        rho_nll_time_sharded(pr, CFG, data, mesh)


def test_psi_pscan_and_time_sharded_match():
    """The pure state is a rank-1 purification factor: the parallel-in-time
    and time-sharded paths must reproduce psi_nll exactly."""
    import dataclasses
    from audio_mps_tpu.models.params import init_psi
    from audio_mps_tpu.models import core as _core
    from audio_mps_tpu.parallel.time_pscan import psi_nll_time_sharded
    from audio_mps_tpu.parallel.time_pipeline import make_time_mesh

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T = 8 * 24 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)
    pp = init_psi(jax.random.PRNGKey(0), cfg)
    ref = float(_core.psi_nll(pp, cfg, data))
    v1 = float(_core.psi_nll_pscan(pp, cfg, data, time_chunk=48))
    np.testing.assert_allclose(v1, ref, rtol=1e-5)
    mesh = make_time_mesh(8)
    v2 = float(jax.jit(lambda p: psi_nll_time_sharded(p, cfg, data, mesh))(pp))
    np.testing.assert_allclose(v2, ref, rtol=1e-5)


def test_combined_dp_time_sharded_matches_single_device():
    """2D (data x time) mesh: combined data-parallel + time-sharded
    training == the single-device step (values, grads via the one-step
    parameter trajectory) for both model families."""
    import dataclasses
    from audio_mps_tpu.models import core as _core
    from audio_mps_tpu.models.params import init_psi, init_rho
    from audio_mps_tpu.parallel.combined import (make_2d_mesh,
                                                 make_dp_time_train_step,
                                                 shard_batch_2d)
    from audio_mps_tpu.parallel.time_pscan import rho_nll_time_sharded
    from audio_mps_tpu.training import make_train_step

    mesh = make_2d_mesh(2, 4)
    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T = 4 * 32 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)

    for name, init in (("rho_mps", init_rho), ("psi_mps", init_psi)):
        pr = init(jax.random.PRNGKey(1), cfg)
        ref_fn = (_core.rho_nll_factor if name == "rho_mps"
                  else _core.psi_nll)
        ref = float(ref_fn(pr, cfg, data))
        v = float(jax.jit(lambda p: rho_nll_time_sharded(
            p, cfg, data, mesh, time_chunk=16, batch_axis="data"))(pr))
        np.testing.assert_allclose(v, ref, rtol=1e-5, atol=1e-6)

        opt, step = make_dp_time_train_step(name, cfg, mesh, time_chunk=16)
        p2, _, m = step(pr, opt.init(pr), shard_batch_2d(data, mesh))
        opt_s, step_s = make_train_step(name, cfg, fused=False)
        p1, _, m1 = step_s(init(jax.random.PRNGKey(1), cfg),
                           opt_s.init(init(jax.random.PRNGKey(1), cfg)),
                           data)
        np.testing.assert_allclose(float(m["model_loss"]),
                                   float(m1["model_loss"]), rtol=1e-5,
                                   atol=1e-6)
        for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mps_model", ["psi_mps", "rho_mps", "latent"])
def test_dp_sample_fused_matches_xla(mps_model):
    """Sharded sampling through the fused Pallas SDE kernels (interpret
    mode under shard_map on the CPU mesh) == the sharded XLA-scan sampler
    for the same key, for all three families."""
    mesh = make_mesh()
    cfg = dataclasses.replace(CFG, latent_dim=4, latent_hidden=16)
    params = replicate(init_params_for(mps_model, jax.random.PRNGKey(0),
                                       cfg), mesh)
    key = jax.random.PRNGKey(5)
    w_xla = np.asarray(make_dp_sample(mps_model, cfg, mesh, fused=False)(
        8, 48)(params, key))
    w_fus = np.asarray(make_dp_sample(mps_model, cfg, mesh, fused=True)(
        8, 48)(params, key))
    assert w_fus.shape == (8, 48)
    np.testing.assert_allclose(w_fus, w_xla, rtol=2e-4,
                               atol=2e-6 * np.abs(w_xla).max() + 1e-9)


def test_rank_sharded_matches_single_device():
    """Purification-rank sharding (the rho family's TP): NLL with the
    rank rows split over an 8-device 'model' mesh == the single-device
    factor scan, values AND gradients (incl. the W-shard cotangents
    gathering back to the full [rank, D] parameters)."""
    from audio_mps_tpu.parallel import make_model_mesh, \
        rho_nll_rank_sharded
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.models import core as _core

    cfg = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=32)
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 161, cfg.delta_t)
    mesh = make_model_mesh(8)
    pr = init_rho(jax.random.PRNGKey(1), cfg)   # rank = D = 8 over 8 devs

    ref = float(_core.rho_nll_factor(pr, cfg, data))
    v = float(jax.jit(lambda p: rho_nll_rank_sharded(p, cfg, data,
                                                     mesh))(pr))
    np.testing.assert_allclose(v, ref, rtol=1e-5, atol=1e-7)

    g_ref = jax.grad(_core.rho_nll_factor)(pr, cfg, data)
    g_sh = jax.jit(jax.grad(
        lambda p: rho_nll_rank_sharded(p, cfg, data, mesh)))(pr)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-6)


def test_rank_sharded_low_rank_and_validation():
    from audio_mps_tpu.parallel import make_model_mesh, \
        rho_nll_rank_sharded
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.models import core as _core

    mesh = make_model_mesh(4)
    cfg = CMPSConfig(minibatch_size=2, bond_dim=6, scan_chunk=0,
                     initial_rank=4)
    data = damped_sine_batch(jax.random.PRNGKey(2), 2, 65, cfg.delta_t)
    pr = init_rho(jax.random.PRNGKey(1), cfg)
    v = float(jax.jit(lambda p: rho_nll_rank_sharded(p, cfg, data,
                                                     mesh))(pr))
    np.testing.assert_allclose(v, float(_core.rho_nll_factor(pr, cfg,
                                                             data)),
                               rtol=1e-5, atol=1e-6)
    # the model axis size must divide the rank
    mesh3 = make_model_mesh(3)
    with pytest.raises(ValueError, match="must be divisible"):
        rho_nll_rank_sharded(pr, cfg, data, mesh3)


def test_dp_rank_2d_train_step_matches_single_device():
    """Combined 2D (data x model) mesh — DP x rank-TP for the rho family:
    one training step on the 2x4 mesh (batch over data, purification rank
    over model) == the single-device step, values and parameters."""
    from audio_mps_tpu.parallel.rank_parallel import (
        make_2d_rank_mesh, make_dp_rank_train_step)
    from audio_mps_tpu.models.params import init_rho

    mesh = make_2d_rank_mesh(2, 4)
    cfg = CMPSConfig(minibatch_size=4, bond_dim=8, scan_chunk=32)
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 129, cfg.delta_t)

    pr = init_rho(jax.random.PRNGKey(1), cfg)     # rank 8 over 4 shards
    opt2, step2 = make_dp_rank_train_step(cfg, mesh)
    p2, _, m2 = step2(pr, opt2.init(pr), data)

    opt_s, step_s = make_train_step("rho_mps", cfg, fused=False)
    pr_s = init_rho(jax.random.PRNGKey(1), cfg)
    p1, _, m1 = step_s(pr_s, opt_s.init(pr_s), data)

    np.testing.assert_allclose(float(m2["model_loss"]),
                               float(m1["model_loss"]), rtol=1e-5,
                               atol=1e-7)
    for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_time_strategies_survive_multi_step_training():
    """Regression (r4): params-derived arrays used to enter the time
    shard_maps as CLOSURE captures; once a step's committed outputs (with
    their mesh NamedSharding) fed the next call, the scan transpose built
    cotangent zeros with Auto-mesh avals inside the Manual context and
    raised. Three consecutive optimizer steps through both time
    strategies must run (constants now enter as replicated operands)."""
    import optax
    from audio_mps_tpu.parallel.time_pipeline import (make_time_mesh,
                                                      rho_nll_pipelined)
    from audio_mps_tpu.parallel.time_pscan import rho_nll_time_sharded

    cfg = CMPSConfig(minibatch_size=4, bond_dim=4, scan_chunk=32)
    mesh = make_time_mesh(4)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 4, 65, cfg.delta_t)
    opt = optax.adam(1e-3)

    for nll in (lambda p, b: rho_nll_pipelined(p, cfg, b, mesh,
                                               num_microbatches=4),
                lambda p, b: rho_nll_time_sharded(p, cfg, b, mesh,
                                                  time_chunk=16)):
        @jax.jit
        def step(p, s, b, nll=nll):
            loss, g = jax.value_and_grad(nll)(p, b)
            u, s = opt.update(g, s, p)
            return optax.apply_updates(p, u), s, loss

        p = init_params_for("rho_mps", jax.random.PRNGKey(0), cfg)
        s = opt.init(p)
        losses = []
        for _ in range(3):
            p, s, loss = step(p, s, batch)
            losses.append(float(loss))
        assert all(np.isfinite(v) for v in losses), losses


def test_time_pipeline_fused_matches_single_device():
    """FUSED temporal pipeline (carried-state partials kernels per stage)
    == the single-device scans, both families — values AND gradients.
    psi rides the rho kernels as a rank-1 purification (G = conj(psi)^T),
    so this also pins that embedding."""
    from audio_mps_tpu.parallel.time_pipeline import (
        make_time_mesh, psi_nll_pipelined_fused, rho_nll_pipelined_fused)
    from audio_mps_tpu.models.params import init_psi, init_rho
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T = 4 * 24 + 1                       # 24 steps per stage
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)
    mesh = make_time_mesh(4)

    pp = init_psi(jax.random.PRNGKey(0), cfg)
    ref = float(_core.psi_nll(pp, cfg, data))
    got = float(psi_nll_pipelined_fused(pp, cfg, data, mesh,
                                        num_microbatches=4))
    # atol guards the near-zero loss at this tiny T: the unroll pick
    # (a divisor of the per-stage chunk) sets the block summation order
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
    g_ref = jax.grad(_core.psi_nll)(pp, cfg, data)
    g_got = jax.jit(jax.grad(
        lambda p: psi_nll_pipelined_fused(p, cfg, data, mesh,
                                          num_microbatches=2)))(pp)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-6)

    # rho, low-rank purification (rank 2 < D)
    cfg_r = dataclasses.replace(cfg, initial_rank=2)
    pr = init_rho(jax.random.PRNGKey(1), cfg_r)
    ref = float(_core.rho_nll_factor(pr, cfg_r, data))
    got = float(rho_nll_pipelined_fused(pr, cfg_r, data, mesh,
                                        num_microbatches=2))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    g_ref = jax.grad(lambda p: _core.rho_nll_factor(p, cfg_r, data))(pr)
    g_got = jax.jit(jax.grad(
        lambda p: rho_nll_pipelined_fused(p, cfg_r, data, mesh,
                                          num_microbatches=2)))(pr)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-6)


def test_auto_microbatches_tile_aware():
    """The fused pipeline's default M fills 128-lane tiles: per-example
    microbatches that pad half-empty tiles cost a full tick each
    (PIPEBENCH_r04 cost model, tick ~ a + c*tiles with a ~= c)."""
    from audio_mps_tpu.parallel.time_pipeline import auto_microbatches
    cfg = CMPSConfig(bond_dim=64, minibatch_size=8)
    # rho full-rank: b=2 x rank 64 = exactly one tile; (4+7)*2 beats
    # per-example's (8+7)*2 and wider-but-multi-tile picks
    assert auto_microbatches(cfg, 8, 64, 8) == 4
    # psi (rank-1) at B<=128: every width is one padded tile, so the
    # model honestly degenerates to M=1 (use pscan/DP there instead)
    assert auto_microbatches(cfg, 128, 1, 8) == 1
    # M always divides B
    for B in (6, 12):
        m = auto_microbatches(cfg, B, 64, 8)
        assert B % m == 0


def test_resolve_fused_microbatches_gate():
    """The ONE fused-gate / microbatch resolution shared by every
    pipeline train-step factory (review r4: the dance had been
    copy-pasted into four factories with drift risk)."""
    from audio_mps_tpu.parallel.time_pipeline import (
        _auto_fused_pipeline, auto_microbatches, resolve_fused_microbatches)
    cfg = dataclasses.replace(CFG, initial_rank=2)
    # structural failure (e.g. (T-1) % S != 0): auto falls to XLA with
    # the per-data-shard per-example default
    assert resolve_fused_microbatches(cfg, None, None, 8, 2, 4,
                                      n_data=2, structural=False) \
        == (False, 4)
    # explicit False honors the request; explicit M honored
    assert resolve_fused_microbatches(cfg, False, 3, 8, 2, 4) == (False, 3)
    # family gate (the latent loss type) only blocks the AUTO pick
    use, _ = resolve_fused_microbatches(cfg, None, None, 8, 1, 4,
                                        extra=False)
    assert use is False
    assert resolve_fused_microbatches(cfg, True, 2, 8, 1, 4,
                                      extra=False)[0] is True
    # auto pick: the tile-aware candidate M, gated on whole data shards
    # + the VMEM/layout judgement at the per-shard width
    m = auto_microbatches(cfg, 8, 2, 4)
    use, got = resolve_fused_microbatches(cfg, None, None, 8, 2, 4)
    assert got == (m if use else 8)
    assert use == _auto_fused_pipeline(cfg, 2, 8 // m)
    # an explicit M that leaves ragged data shards cannot auto-fuse
    assert resolve_fused_microbatches(cfg, None, 3, 8, 2, 4,
                                      n_data=2)[0] is False
    # xla_default overrides the fallback M (the latent family's
    # replicated-over-data XLA path wants per-example over the FULL B)
    assert resolve_fused_microbatches(cfg, False, None, 8, 1, 4,
                                      n_data=2, xla_default=8) \
        == (False, 8)
    # num_microbatches=0 is rejected up front on EVERY path (ADVICE r4:
    # the falsy 0 used to slide through the fused branch as "unset" and
    # through the XLA branch as a literal microbatch count)
    with pytest.raises(ValueError, match="num_microbatches"):
        resolve_fused_microbatches(cfg, None, 0, 8, 2, 4)
    with pytest.raises(ValueError, match="num_microbatches"):
        resolve_fused_microbatches(cfg, False, 0, 8, 2, 4)


def test_fused_pipeline_tick_segment_repicks_unroll():
    """An explicit tick_segment that is a valid divisor of the stage
    chunk is accepted even when the WHOLE-chunk auto unroll doesn't land
    on its boundary — the unroll is re-picked against the segment
    (review r4; an explicit unroll still pins the block grid and
    rejects misaligned segments like the other kernel knobs)."""
    from audio_mps_tpu.parallel.time_pipeline import (
        make_time_mesh, rho_nll_pipelined_fused)
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0,
                              initial_rank=2)
    T = 4 * 16 + 1                       # Tc = 16 steps per stage
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)
    mesh = make_time_mesh(4)
    pr = init_rho(jax.random.PRNGKey(1), cfg)
    ref = float(_core.rho_nll_factor(pr, cfg, data))
    # tick_segment=2: whatever divisor-of-16 the auto unroll picked, a
    # 2-step segment re-picks u in {1, 2} and runs exactly
    seg = float(rho_nll_pipelined_fused(pr, cfg, data, mesh,
                                        num_microbatches=2,
                                        tick_segment=2))
    np.testing.assert_allclose(seg, ref, rtol=1e-5)
    # an EXPLICIT unroll that doesn't divide the segment still raises
    with pytest.raises(ValueError, match="tick_segment"):
        rho_nll_pipelined_fused(pr, cfg, data, mesh, num_microbatches=2,
                                unroll=4, tick_segment=2)


def test_time_train_step_matches_single_device():
    """make_time_train_step (XLA and fused hot loops) reproduces the
    single-device one-Adam-step parameter trajectory exactly."""
    from audio_mps_tpu.parallel import make_time_mesh, make_time_train_step

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T = 4 * 16 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)
    mesh = make_time_mesh(4)

    for model in ("rho_mps", "psi_mps"):
        ref_params = init_params_for(model, jax.random.PRNGKey(0), cfg)
        opt_ref, step_ref = make_train_step(model, cfg, fused=False)
        p_ref, _, m_ref = step_ref(ref_params, opt_ref.init(ref_params),
                                   data)
        for fused in (False, True):
            params = init_params_for(model, jax.random.PRNGKey(0), cfg)
            opt, step = make_time_train_step(model, cfg, mesh, fused=fused)
            p, _, m = step(params, opt.init(params), data)
            np.testing.assert_allclose(
                float(m["model_loss"]), float(m_ref["model_loss"]),
                rtol=1e-5, err_msg=f"{model} fused={fused}")
            for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_ref)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7,
                    err_msg=f"{model} fused={fused}")

    with pytest.raises(ValueError, match="mps_model"):
        make_time_train_step("not_a_model", cfg, mesh)


def test_latent_elbo_pipelined_matches_single_device():
    """The latent family's pipelined ELBO (per-example decoded psi_0
    injected at stage 0) == models.latent.elbo_loss: values + grads, for
    the XLA pipeline (both loss types) and the fused carried-state
    kernels (psi_0 as per-example rank-1 purification factors)."""
    from audio_mps_tpu.models import latent as latent_lib
    from audio_mps_tpu.parallel import make_time_mesh
    from audio_mps_tpu.parallel.time_pipeline import latent_elbo_pipelined

    cfg = dataclasses.replace(CFG, latent_dim=4, latent_hidden=16,
                              scan_chunk=0)
    T = 4 * 16 + 1
    params = init_params_for("latent", jax.random.PRNGKey(0), cfg)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 8, T, cfg.delta_t)
    eps = jax.random.normal(jax.random.PRNGKey(9), (8, cfg.latent_dim))
    mesh = make_time_mesh(4)

    for loss_type in ("log", "quadratic"):
        v_ref, g_ref = jax.value_and_grad(
            lambda p: latent_lib.elbo_loss(
                p, cfg, batch, eps=eps, beta=0.7,
                loss_type=loss_type)[0])(params)
        for fused in ((False, True) if loss_type == "log" else (False,)):
            v, g = jax.jit(jax.value_and_grad(
                lambda p: latent_elbo_pipelined(
                    p, cfg, batch, mesh, eps=eps, beta=0.7,
                    loss_type=loss_type, num_microbatches=4,
                    fused=fused)[0]))(params)
            np.testing.assert_allclose(
                float(v), float(v_ref), rtol=1e-5,
                err_msg=f"{loss_type} fused={fused}")
            for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                    err_msg=f"{loss_type} fused={fused}")


def test_latent_time_train_step_matches_single_device():
    """make_time_train_step("latent") reproduces the single-device latent
    one-Adam-step trajectory exactly (same key -> same replicated
    reparameterization noise), XLA and fused hot loops."""
    from audio_mps_tpu.parallel import make_time_mesh, make_time_train_step

    cfg = dataclasses.replace(CFG, minibatch_size=8, latent_dim=4,
                              latent_hidden=16, scan_chunk=0)
    T = 4 * 16 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 8, T, cfg.delta_t)
    key = jax.random.PRNGKey(9)
    mesh = make_time_mesh(4)

    ref_params = init_params_for("latent", jax.random.PRNGKey(0), cfg)
    opt_ref, step_ref = make_train_step("latent", cfg, fused=False)
    p_ref, _, m_ref = step_ref(ref_params, opt_ref.init(ref_params),
                               data, key)
    for fused in (False, True):
        params = init_params_for("latent", jax.random.PRNGKey(0), cfg)
        opt, step = make_time_train_step("latent", cfg, mesh, fused=fused,
                                         num_microbatches=4)
        p, _, m = step(params, opt.init(params), data, key)
        np.testing.assert_allclose(
            float(m["model_loss"]), float(m_ref["model_loss"]),
            rtol=1e-5, err_msg=f"latent fused={fused}")
        np.testing.assert_allclose(float(m["kl"]), float(m_ref["kl"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=f"latent fused={fused}")


def test_dp_time_fused_pipeline_matches_single_device():
    """DP x FUSED-pipeline on a (data, time) 2D mesh == the single-device
    scans: NLL values+grads and the make_dp_time_train_step(fused=True)
    one-Adam-step parameter trajectory."""
    from audio_mps_tpu.parallel.combined import (
        make_2d_mesh, make_dp_time_train_step, shard_batch_2d)
    from audio_mps_tpu.parallel.time_pipeline import (
        psi_nll_pipelined_fused, rho_nll_pipelined_fused)
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=8, scan_chunk=0)
    T = 4 * 12 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 8, T, cfg.delta_t)
    mesh2 = make_2d_mesh(2, 4)

    pr = init_rho(jax.random.PRNGKey(1), cfg)
    ref = float(_core.rho_nll_factor(pr, cfg, data))
    got = float(rho_nll_pipelined_fused(pr, cfg, data, mesh2,
                                        num_microbatches=2,
                                        data_axis="data"))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    g_ref = jax.grad(lambda p: _core.rho_nll_factor(p, cfg, data))(pr)
    g_got = jax.jit(jax.grad(
        lambda p: rho_nll_pipelined_fused(p, cfg, data, mesh2,
                                          num_microbatches=2,
                                          data_axis="data")))(pr)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-6)

    for model in ("rho_mps", "psi_mps"):
        ref_params = init_params_for(model, jax.random.PRNGKey(0), cfg)
        opt_ref, step_ref = make_train_step(model, cfg, fused=False)
        p_ref, _, m_ref = step_ref(ref_params, opt_ref.init(ref_params),
                                   data)
        params = init_params_for(model, jax.random.PRNGKey(0), cfg)
        opt, step = make_dp_time_train_step(model, cfg, mesh2, fused=True,
                                            num_microbatches=2)
        p, _, m = step(params, opt.init(params),
                       shard_batch_2d(data, mesh2))
        np.testing.assert_allclose(
            float(m["model_loss"]), float(m_ref["model_loss"]),
            rtol=1e-5, err_msg=model)
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-7, err_msg=model)

    # microbatch divisibility validation
    with pytest.raises(ValueError, match="divisible"):
        rho_nll_pipelined_fused(pr, cfg, data, mesh2, num_microbatches=8,
                                data_axis="data")


def test_fused_pipeline_memory_plan():
    """_fused_pipeline_plan mirrors the monolithic partials path's
    residual budgets (rho_nll_rank_partials / auto_time_segment): stream
    when the WHOLE pipeline's stream fits STREAM_HBM_LIMIT, else keep
    block-entry checkpoints if all live ticks' fit SEGMENT_CK_BUDGET,
    else remat per tick (one tick's stream preferred), else segment
    within the tick. Pure arithmetic — interpret=False probes the real
    TPU budgets without touching a device (step = 64 KiB at D=64,
    BR=128)."""
    from audio_mps_tpu.parallel.time_pipeline import _fused_pipeline_plan
    cfg = CMPSConfig(bond_dim=64, minibatch_size=8)     # kernel_stream auto
    BR, u = 128, 4
    # whole-pipeline stream fits (4.3 GB <= 6 GiB): the measured fast path
    assert _fused_pipeline_plan(cfg, BR, 8192, 8, u, False) == \
        (True, False, None)
    # whole stream busts (8.6 GB), all-tick checkpoints bust (2 GiB),
    # one tick's stream fits (1.07 GB): remat ticks, streamed
    assert _fused_pipeline_plan(cfg, BR, 16384, 8, u, False) == \
        (True, True, None)
    # same shape with streaming off: remat + one tick's ck (256 MB) fits
    cfg_off = dataclasses.replace(cfg, kernel_stream="off")
    assert _fused_pipeline_plan(cfg_off, BR, 16384, 8, u, False) == \
        (False, True, None)
    # misaligned lanes (BR=96): stream structurally unavailable; the
    # all-tick ck (1.6 GB) busts -> remat + per-tick ck (201 MB)
    assert _fused_pipeline_plan(cfg, 96, 16384, 8, u, False) == \
        (False, True, None)
    # giant tick (2^19 steps): even ONE tick busts both budgets ->
    # intra-tick segmentation in whole unroll blocks; the stream-fitting
    # divisor is preferred (measured: segmentation free, stream wins)
    assert _fused_pipeline_plan(cfg, BR, 2 ** 19, 8, u, False) == \
        (True, True, 16384 * u)
    assert _fused_pipeline_plan(cfg_off, BR, 2 ** 19, 8, u, False) == \
        (False, True, 16384 * u)


def test_fused_pipeline_remat_and_segment_match():
    """The beyond-budget memory plans — per-tick remat and intra-tick
    segmentation — are EXACT: values + grads match the unsegmented fused
    pipeline and the single-device factor scan (segments are whole
    unroll blocks, so the per-block renormalization/trp structure is
    unchanged)."""
    from audio_mps_tpu.parallel.time_pipeline import (
        make_time_mesh, rho_nll_pipelined_fused)
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0,
                              initial_rank=2)
    T = 4 * 24 + 1                       # Tc = 24 steps per stage
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, cfg.delta_t)
    mesh = make_time_mesh(4)
    pr = init_rho(jax.random.PRNGKey(1), cfg)

    ref = float(_core.rho_nll_factor(pr, cfg, data))
    base = float(rho_nll_pipelined_fused(pr, cfg, data, mesh,
                                         num_microbatches=2, unroll=2))
    np.testing.assert_allclose(base, ref, rtol=1e-5)
    # per-tick remat: bitwise-deterministic recompute of the same kernels
    remat = float(rho_nll_pipelined_fused(pr, cfg, data, mesh,
                                          num_microbatches=2, unroll=2,
                                          remat_ticks=True))
    np.testing.assert_allclose(remat, base, rtol=1e-6)
    # intra-tick segmentation (24 = 4 segments x 6 steps x unroll 2)
    seg = float(rho_nll_pipelined_fused(pr, cfg, data, mesh,
                                        num_microbatches=2, unroll=2,
                                        tick_segment=6))
    np.testing.assert_allclose(seg, base, rtol=1e-6)

    g_ref = jax.grad(lambda p: _core.rho_nll_factor(p, cfg, data))(pr)
    # tick_segment == Tc (24): the degenerate one-segment case still
    # CHECKPOINTS the tick (an explicit segment always bounds the
    # backward footprint to one segment's residuals)
    for kw in ({"remat_ticks": True}, {"tick_segment": 6},
               {"tick_segment": 6, "remat_ticks": True},
               {"tick_segment": 24}):
        g_got = jax.jit(jax.grad(
            lambda p: rho_nll_pipelined_fused(p, cfg, data, mesh,
                                              num_microbatches=2,
                                              unroll=2, **kw)))(pr)
        for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-6, err_msg=str(kw))

    # validation: segments must be positive divisors of the stage chunk
    # in unroll blocks (0 must raise the contract error, not crash on
    # the modulo)
    for bad in (5, 0, -6):
        with pytest.raises(ValueError, match="tick_segment"):
            rho_nll_pipelined_fused(pr, cfg, data, mesh,
                                    num_microbatches=2, unroll=2,
                                    tick_segment=bad)


def test_fused_pipeline_explicit_unroll_rejected():
    """An explicit non-divisor unroll RAISES (like the other kernel
    knobs) instead of being silently swapped for a divisor — an A/B
    harness must never measure a different unroll than it requested.
    unroll=None keeps the auto divisor pick."""
    from audio_mps_tpu.ops.pallas_rank import rank_partials_chunk_factory
    from audio_mps_tpu.parallel.time_pipeline import (
        make_time_mesh, rho_nll_pipelined_fused)
    from audio_mps_tpu.models.params import init_rho

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0,
                              initial_rank=2)
    with pytest.raises(ValueError, match="must divide"):
        rank_partials_chunk_factory(cfg, 4, 24, 2, unroll=5,
                                    interpret=True)
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, 97, cfg.delta_t)
    pr = init_rho(jax.random.PRNGKey(1), cfg)
    with pytest.raises(ValueError, match="must divide"):
        rho_nll_pipelined_fused(pr, cfg, data, make_time_mesh(4),
                                num_microbatches=2, unroll=5)


def test_pipeline_multi_axis_mesh_uses_axis_size():
    """Driving the pipeline on ONE axis of a multi-axis mesh must use
    that AXIS's size, not the total device count: with a (2 data x 4
    time) mesh and axis='time', S is 4 — deriving S=8 from
    mesh.devices.size made the XLA path's [M, b, S, Tc] chunk reshape
    silently DROP half of every waveform (T-1=96 divides both 4 and 8,
    so nothing raised)."""
    from audio_mps_tpu.parallel.combined import make_2d_mesh
    from audio_mps_tpu.parallel.time_pipeline import (
        TIME_AXIS, make_time_train_step, psi_nll_pipelined,
        psi_nll_pipelined_fused)
    from audio_mps_tpu.models.params import init_psi
    from audio_mps_tpu.models import core as _core

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T = 97                               # T-1 = 96: divisible by 4 AND 8
    data = damped_sine_batch(jax.random.PRNGKey(3), 4, T, cfg.delta_t)
    mesh2 = make_2d_mesh(2, 4)
    pp = init_psi(jax.random.PRNGKey(0), cfg)
    ref = float(_core.psi_nll(pp, cfg, data))

    got = float(psi_nll_pipelined(pp, cfg, data, mesh2,
                                  num_microbatches=4, axis=TIME_AXIS))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)
    got = float(psi_nll_pipelined_fused(pp, cfg, data, mesh2,
                                        num_microbatches=4,
                                        axis=TIME_AXIS))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-7)

    # the train-step builder's divisibility/auto logic must also judge
    # the time AXIS (device count 8 would reject T-1=96... no: 96 % 8
    # == 0 too — it would WRONGLY pass S=8 down); pin the loss through
    # one full step
    ref_params = init_params_for("psi_mps", jax.random.PRNGKey(0), cfg)
    opt_ref, step_ref = make_train_step("psi_mps", cfg, fused=False)
    _, _, m_ref = step_ref(ref_params, opt_ref.init(ref_params), data)
    params = init_params_for("psi_mps", jax.random.PRNGKey(0), cfg)
    opt, step = make_time_train_step("psi_mps", cfg, mesh2, fused=False)
    _, _, m = step(params, opt.init(params), data)
    np.testing.assert_allclose(float(m["model_loss"]),
                               float(m_ref["model_loss"]), rtol=1e-5)


def test_dp_time_fused_default_microbatches():
    """make_dp_time_train_step with fused=True and NO explicit M uses the
    lane-tile-aware auto_microbatches pick over the per-data-shard width
    (not the per-example default the XLA path keeps) — and the result is
    still exact vs the single-device step (M never changes values)."""
    from audio_mps_tpu.parallel.combined import (
        make_2d_mesh, make_dp_time_train_step, shard_batch_2d)

    cfg = dataclasses.replace(CFG, minibatch_size=8, scan_chunk=0)
    T = 4 * 12 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 8, T, cfg.delta_t)
    mesh2 = make_2d_mesh(2, 4)

    ref_params = init_params_for("rho_mps", jax.random.PRNGKey(0), cfg)
    opt_ref, step_ref = make_train_step("rho_mps", cfg, fused=False)
    p_ref, _, m_ref = step_ref(ref_params, opt_ref.init(ref_params), data)
    params = init_params_for("rho_mps", jax.random.PRNGKey(0), cfg)
    opt, step = make_dp_time_train_step("rho_mps", cfg, mesh2, fused=True)
    p, _, m = step(params, opt.init(params), shard_batch_2d(data, mesh2))
    np.testing.assert_allclose(float(m["model_loss"]),
                               float(m_ref["model_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_dp_time_latent_step_matches_single_device():
    """The latent family composes with DP x time: make_dp_time_train_step
    ("latent") on a (2 data x 4 time) mesh reproduces the single-device
    latent step (same key -> same reparameterization noise), with the
    fused reconstruction sharding microbatch examples over the data axis
    and the XLA fallback running replicated over it."""
    from audio_mps_tpu.parallel.combined import (
        make_2d_mesh, make_dp_time_train_step, shard_batch_2d)

    cfg = dataclasses.replace(CFG, latent_dim=4, latent_hidden=16,
                              scan_chunk=0)
    T_lat = 129                          # T-1 = 128: 4 stages x 32 steps
    batch = damped_sine_batch(jax.random.PRNGKey(1), 8, T_lat, cfg.delta_t)
    key = jax.random.PRNGKey(9)
    mesh2 = make_2d_mesh(2, 4)

    params = init_params_for("latent", jax.random.PRNGKey(0), cfg)
    opt_s, step_s = make_train_step("latent", cfg)
    p1, _, m1 = step_s(params, opt_s.init(params), batch, key)

    for fused in (False, True):
        params_d = init_params_for("latent", jax.random.PRNGKey(0), cfg)
        opt_d, step_d = make_dp_time_train_step("latent", cfg, mesh2,
                                                fused=fused)
        p2, _, m2 = step_d(params_d, opt_d.init(params_d),
                           shard_batch_2d(batch, mesh2), key)
        np.testing.assert_allclose(float(m2["model_loss"]),
                                   float(m1["model_loss"]), rtol=1e-5,
                                   err_msg=f"fused={fused}")
        np.testing.assert_allclose(float(m2["kl"]), float(m1["kl"]),
                                   rtol=1e-5, err_msg=f"fused={fused}")
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=f"fused={fused}")


def test_latent_elbo_pipelined_knob_validation_and_data_axis():
    """Direct-call API contracts of latent_elbo_pipelined: fused-kernel
    knobs raise on the XLA path instead of being silently dropped, and
    data_axis on a 2D mesh is exact for both hot loops (the XLA fallback
    runs replicated over data; the fused path shards examples)."""
    from audio_mps_tpu.models import latent as latent_lib
    from audio_mps_tpu.parallel import make_time_mesh
    from audio_mps_tpu.parallel.combined import make_2d_mesh
    from audio_mps_tpu.parallel.time_pipeline import latent_elbo_pipelined

    cfg = dataclasses.replace(CFG, latent_dim=4, latent_hidden=16,
                              scan_chunk=0)
    T_lat = 65
    params = init_params_for("latent", jax.random.PRNGKey(0), cfg)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 8, T_lat, cfg.delta_t)
    eps = jax.random.normal(jax.random.PRNGKey(9), (8, cfg.latent_dim))

    with pytest.raises(ValueError, match="fused-kernel knobs"):
        latent_elbo_pipelined(params, cfg, batch, make_time_mesh(4),
                              eps=eps, fused=False, num_microbatches=4,
                              stream=True)

    ref = float(latent_lib.elbo_loss(params, cfg, batch, eps=eps)[0])
    mesh2 = make_2d_mesh(2, 4)
    for fused in (False, True):
        got = float(latent_elbo_pipelined(
            params, cfg, batch, mesh2, eps=eps, fused=fused,
            num_microbatches=4, data_axis="data")[0])
        np.testing.assert_allclose(got, ref, rtol=1e-5,
                                   err_msg=f"fused={fused}")


def test_rank_time_pipeline_matches_single_device():
    """TP x PP: purification rank sharded over 'model' AND time pipelined
    over 'time' (a (1, 2, 2) slice of the 3D mesh) == the single-device
    factor scan — values and gradients, for BOTH hot loops: the fused
    carried-state kernels (per-tick partials all_gather + carried gamma,
    _sharded_chunk_nll) and the XLA per-step-psum pipeline
    (rho_nll_rank_pipelined)."""
    from audio_mps_tpu.models import core as _core
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.parallel import make_3d_mesh
    from audio_mps_tpu.parallel.time_pipeline import (
        rho_nll_pipelined_fused, rho_nll_rank_pipelined)

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T_p = 2 * 24 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T_p, cfg.delta_t)
    mesh = make_3d_mesh(1, 2, 2)

    for rank_cfg in (cfg, dataclasses.replace(cfg, initial_rank=2)):
        p = init_rho(jax.random.PRNGKey(1), rank_cfg)
        ref = float(_core.rho_nll_factor(p, rank_cfg, data))
        g_ref = jax.grad(
            lambda q: _core.rho_nll_factor(q, rank_cfg, data))(p)
        for name, nll in (
                ("fused", lambda q: rho_nll_pipelined_fused(
                    q, rank_cfg, data, mesh, num_microbatches=2,
                    model_axis="model")),
                ("xla", lambda q: rho_nll_rank_pipelined(
                    q, rank_cfg, data, mesh, num_microbatches=2))):
            got = float(nll(p))
            np.testing.assert_allclose(got, ref, rtol=1e-5,
                                       err_msg=name)
            g_got = jax.jit(jax.grad(nll))(p)
            for a, b in zip(jax.tree.leaves(g_ref),
                            jax.tree.leaves(g_got)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-6,
                    err_msg=name)


def test_dp_rank_time_3d_step_matches_single_device():
    """The full 3D DP x TP x PP training step (make_dp_rank_time_train_step
    on a (2 data, 2 model, 2 time) mesh) reproduces the single-device
    one-Adam-step parameter trajectory, both hot loops."""
    from audio_mps_tpu.parallel import (make_3d_mesh,
                                        make_dp_rank_time_train_step)

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T_p = 2 * 24 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T_p, cfg.delta_t)
    mesh = make_3d_mesh(2, 2, 2)

    p0 = init_params_for("rho_mps", jax.random.PRNGKey(0), cfg)
    opt_ref, step_ref = make_train_step("rho_mps", cfg, fused=False)
    p_ref, _, m_ref = step_ref(p0, opt_ref.init(p0), data)

    for fused in (False, True):
        p = init_params_for("rho_mps", jax.random.PRNGKey(0), cfg)
        opt, step = make_dp_rank_time_train_step(cfg, mesh, fused=fused)
        p1, _, m1 = step(p, opt.init(p), data)
        np.testing.assert_allclose(
            float(m1["model_loss"]), float(m_ref["model_loss"]),
            rtol=1e-5, err_msg=f"fused={fused}")
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-7,
                                       err_msg=f"fused={fused}")

    with pytest.raises(ValueError, match="axes"):
        make_dp_rank_time_train_step(cfg, make_mesh(8))


def test_rank_time_pipeline_plan_legs_and_validation():
    """Sharded fused pipeline: the memory-plan legs (remat_ticks /
    tick_segment — the carried gamma must thread the checkpointed
    segment scan) agree with the unconstrained run, values AND grads;
    rank-indivisible and per-example model sharding raise."""
    from audio_mps_tpu.models.params import init_rho
    from audio_mps_tpu.parallel import make_3d_mesh
    from audio_mps_tpu.parallel.time_pipeline import (
        latent_elbo_pipelined, rho_nll_pipelined_fused)

    cfg = dataclasses.replace(CFG, minibatch_size=4, scan_chunk=0)
    T_p = 2 * 24 + 1
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T_p, cfg.delta_t)
    mesh = make_3d_mesh(2, 2, 2)
    p = init_rho(jax.random.PRNGKey(1), cfg)

    def nll(q, **kw):
        return rho_nll_pipelined_fused(q, cfg, data, mesh,
                                       num_microbatches=2,
                                       data_axis="data",
                                       model_axis="model", **kw)

    base = float(nll(p))
    g0 = jax.grad(nll)(p)
    for kw in ({"remat_ticks": True}, {"tick_segment": 12}):
        got = float(nll(p, **kw))
        np.testing.assert_allclose(got, base, rtol=1e-6, err_msg=str(kw))
        g1 = jax.grad(lambda q: nll(q, **kw))(p)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-8,
                                       err_msg=str(kw))

    # rank not divisible by the model axis
    cfg3 = dataclasses.replace(cfg, initial_rank=3)
    p3 = init_rho(jax.random.PRNGKey(1), cfg3)
    with pytest.raises(ValueError, match="divisible"):
        rho_nll_pipelined_fused(p3, cfg3, data, mesh, num_microbatches=2,
                                model_axis="model")

    # per-example factor rows (the latent family) cannot rank-shard
    cfg_l = dataclasses.replace(cfg, latent_dim=4, latent_hidden=16)
    pl = init_params_for("latent", jax.random.PRNGKey(0), cfg_l)
    data_l = damped_sine_batch(jax.random.PRNGKey(1), 4, 65, cfg_l.delta_t)
    eps = jax.random.normal(jax.random.PRNGKey(9), (4, cfg_l.latent_dim))
    with pytest.raises(ValueError, match="per-example"):
        latent_elbo_pipelined(pl, cfg_l, data_l, mesh, eps=eps,
                              fused=True, num_microbatches=2,
                              model_axis="model")
