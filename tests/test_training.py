"""Training-loop tests: loss decreases, checkpoint/resume restores exactly,
CLI end-to-end on tiny shapes (the reference had no training tests at all —
SURVEY.md §4 gaps)."""
import dataclasses
import glob
import os

import jax
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig, RunConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.training import (Checkpointer, init_params_for,
                                    make_optimizer, make_train_step)

CFG = CMPSConfig(minibatch_size=4, bond_dim=4, scan_chunk=64)
T = 256


def _params_close(a, b):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


@pytest.mark.smoke
@pytest.mark.parametrize("mps_model", ["psi_mps", "rho_mps"])
def test_loss_decreases(mps_model):
    key = jax.random.PRNGKey(0)
    params = init_params_for(mps_model, key, CFG)
    optimizer, step = make_train_step(mps_model, CFG)
    opt_state = optimizer.init(params)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 4, T, CFG.delta_t)
    losses = []
    for _ in range(30):
        params, opt_state, metrics = step(params, opt_state, batch)
        losses.append(float(metrics["model_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no improvement: {losses[0]} -> {losses[-1]}"


def test_checkpoint_restore_roundtrip(tmp_path):
    mps_model = "psi_mps"
    params = init_params_for(mps_model, jax.random.PRNGKey(0), CFG)
    optimizer, step = make_train_step(mps_model, CFG)
    opt_state = optimizer.init(params)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 4, T, CFG.delta_t)
    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, batch)

    ck = Checkpointer(str(tmp_path / "ck"), save_secs=1e9)
    assert ck.maybe_save(3, params, opt_state, force=True)
    ck.close()

    # fresh state, then restore
    params2 = init_params_for(mps_model, jax.random.PRNGKey(42), CFG)
    opt_state2 = make_optimizer(CFG).init(params2)
    ck2 = Checkpointer(str(tmp_path / "ck"))
    rparams, ropt, rstep = ck2.restore(params2, opt_state2)
    ck2.close()
    assert rstep == 3
    _params_close(rparams, params)
    _params_close(ropt, opt_state)


def test_convergence_regression_pinned():
    """Pinned damped-sine convergence anchor (VERDICT r1 item 8): fixed
    seeds, reference hparams (B=8, D=8, Adam 1e-3; BASELINE.md anchor is
    114.1 -> 64.8 over 1200 steps at T=2^16 — this is the test-scale
    T=2048/50-step prefix of the same curve, starting at the same 114.18
    because the reg terms dominate the start). Future optimization rounds
    cannot silently trade training correctness for speed: values pinned to
    1% / 0.05 absolute."""
    import jax.numpy as jnp
    from audio_mps_tpu.data import damped_sine_iterator

    cfg = CMPSConfig(minibatch_size=8, bond_dim=8, scan_chunk=256)
    it = damped_sine_iterator(cfg, 2048, seed=0)
    params = init_params_for("psi_mps", jax.random.PRNGKey(0), cfg)
    opt, step = make_train_step("psi_mps", cfg, fused=False)
    o = opt.init(params)
    first = None
    for i in range(1, 51):
        params, o, m = step(params, o, jnp.asarray(next(it)))
        if i == 1:
            first = float(m["total_loss"])
    final_total = float(m["total_loss"])
    final_model = float(m["model_loss"])
    np.testing.assert_allclose(first, 114.182, rtol=0.01)
    np.testing.assert_allclose(final_total, 111.381, rtol=0.01)
    np.testing.assert_allclose(final_model, -0.4855, atol=0.05)
    assert final_total < first - 2.0, "no convergence"


def test_async_checkpoint_rapid_saves_and_restore(tmp_path):
    """maybe_save is asynchronous (background serialize) — rapid successive
    saves must not corrupt anything, and restore (which joins any in-flight
    save) must see the LATEST step exactly (VERDICT r1 item 8)."""
    mps_model = "psi_mps"
    params = init_params_for(mps_model, jax.random.PRNGKey(0), CFG)
    optimizer, step = make_train_step(mps_model, CFG)
    opt_state = optimizer.init(params)
    batch = damped_sine_batch(jax.random.PRNGKey(1), 4, T, CFG.delta_t)

    ck = Checkpointer(str(tmp_path / "ck"), save_secs=0.0)
    import time as _time
    t0 = _time.time()
    for i in range(1, 4):
        params, opt_state, _ = step(params, opt_state, batch)
        assert ck.maybe_save(i, params, opt_state)
    dispatch_time = _time.time() - t0

    # restore without closing: must join the in-flight save and return
    # exactly the step-3 state
    params2 = init_params_for(mps_model, jax.random.PRNGKey(42), CFG)
    opt_state2 = make_optimizer(CFG).init(params2)
    rparams, ropt, rstep = ck.restore(params2, opt_state2)
    ck.close()
    assert rstep == 3
    _params_close(rparams, params)
    _params_close(ropt, opt_state)
    # the async property itself is the API contract (orbax background
    # serialization); what this test enforces is the restore-joins-save
    # semantics above. dispatch_time is logged for humans, not asserted
    # (a wall-clock bound would flake on loaded CI hosts).
    del dispatch_time


def test_train_cli_end_to_end(tmp_path):
    """Drive audio_mps_tpu.train + .sample end-to-end on tiny shapes."""
    from audio_mps_tpu.train import train
    run = RunConfig(mps_model="psi_mps", dataset="damped_sine",
                    sample_duration=128, max_steps=3, summary_every=2,
                    visualize=False, num_samples=0,
                    logdir=str(tmp_path / "logs"), checkpoint_secs=1e9)
    cfg = CMPSConfig(minibatch_size=2, bond_dim=3, scan_chunk=32)
    params, metrics = train(run, cfg, verbose=False)
    assert np.isfinite(float(metrics["model_loss"]))
    logdir = run.run_logdir(cfg)
    assert glob.glob(os.path.join(logdir, "checkpoints", "*")), \
        "no checkpoint written"

    # sampling CLI restores from that checkpoint
    from audio_mps_tpu.sample import SampleConfig, sample
    out = str(tmp_path / "s.npz")
    waves = sample(SampleConfig(modeldir=logdir, mps_model="psi_mps",
                                hparams="bond_dim=3", sample_duration=64,
                                num_samples=2, out=out, wav=True),
                   verbose=False)
    assert waves.shape == (2, 64)
    assert np.isfinite(waves).all()
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "s_0.wav"))

    # --mesh=dp:2 shards the chains over the mesh through the same CLI
    # (same restored checkpoint; chains fold the shard index into the
    # key, so values differ from single-device — pin shape/finiteness)
    waves_dp = sample(SampleConfig(modeldir=logdir, mps_model="psi_mps",
                                   hparams="bond_dim=3",
                                   sample_duration=64, num_samples=4,
                                   out=str(tmp_path / "sdp.npz"),
                                   wav=False, mesh="dp:2"),
                      verbose=False)
    assert waves_dp.shape == (4, 64)
    assert np.isfinite(waves_dp).all()
    with pytest.raises(ValueError, match="divisible"):
        sample(SampleConfig(modeldir=logdir, mps_model="psi_mps",
                            hparams="bond_dim=3", sample_duration=64,
                            num_samples=3, mesh="dp:2"), verbose=False)
    with pytest.raises(ValueError, match="only dp"):
        sample(SampleConfig(modeldir=logdir, mps_model="psi_mps",
                            hparams="bond_dim=3", sample_duration=64,
                            num_samples=4, mesh="time:2"), verbose=False)


def test_train_cli_latent_end_to_end(tmp_path):
    """--mps_model=latent trains end-to-end from the CLI and the sample CLI
    generates from the prior (VERDICT r1 item 5; reference follow_vae.py is
    broken WIP)."""
    from audio_mps_tpu.train import train
    from audio_mps_tpu.sample import SampleConfig, sample
    run = RunConfig(mps_model="latent", dataset="damped_sine",
                    sample_duration=128, max_steps=3, summary_every=2,
                    visualize=False, num_samples=0,
                    logdir=str(tmp_path / "logs"), checkpoint_secs=1e9,
                    fused="false")
    cfg = CMPSConfig(minibatch_size=2, bond_dim=3, scan_chunk=32,
                     latent_dim=4, latent_hidden=16)
    params, metrics = train(run, cfg, verbose=False)
    assert np.isfinite(float(metrics["model_loss"]))
    assert "recon" in metrics and "kl" in metrics
    assert float(metrics["kl"]) >= 0.0

    waves = sample(SampleConfig(modeldir=run.run_logdir(cfg),
                                sample_duration=64, num_samples=2,
                                out=str(tmp_path / "s.npz"), wav=False),
                   verbose=False)
    assert waves.shape == (2, 64)
    assert np.isfinite(waves).all()


def test_sample_cli_restores_config_json(tmp_path):
    """train persists config.json; sample restores model+hparams from it
    (no --hparams needed)."""
    from audio_mps_tpu.train import train
    from audio_mps_tpu.sample import SampleConfig, sample
    run = RunConfig(mps_model="rho_mps", dataset="damped_sine",
                    sample_duration=128, max_steps=2, summary_every=10,
                    visualize=False, num_samples=0,
                    logdir=str(tmp_path / "logs"), checkpoint_secs=1e9,
                    fused="false")
    cfg = CMPSConfig(minibatch_size=2, bond_dim=5, scan_chunk=32)
    train(run, cfg, verbose=False)
    waves = sample(SampleConfig(modeldir=run.run_logdir(cfg),
                                sample_duration=64, num_samples=2,
                                out=str(tmp_path / "s.npz"), wav=False),
                   verbose=False)
    assert waves.shape == (2, 64)


def test_kernel_knobs_ride_hparams_string():
    """The kernel knobs ride the --hparams string (README quick-start
    example) and resolve to the intended kernel paths; invalid combos are
    rejected at parse time. (Kernel execution itself is pinned by
    tests/test_pallas_block.py — this guards the config plumbing.)"""
    import pytest
    from audio_mps_tpu.config import CMPSConfig
    from audio_mps_tpu.ops.pallas_grad import resolve_layout

    cfg = CMPSConfig().parse("bond_dim=64,kernel_precision=high")
    assert cfg.kernel_precision == "high"
    assert resolve_layout(cfg) == "block"
    cfg2 = CMPSConfig().parse("kernel_layout=block,bond_dim=8")
    assert resolve_layout(cfg2) == "block"
    with pytest.raises(ValueError):
        CMPSConfig().parse("kernel_precision=high,kernel_layout=split")
    with pytest.raises(ValueError):
        CMPSConfig().parse("kernel_layout=block,bond_dim=6")
    with pytest.raises(ValueError):
        CMPSConfig().parse("kernel_layout=blocky")
    # review-r4: initial_rank=0 must be rejected up front (a zero-row W
    # gives tr(rho_0)=0), not resolved as "full rank" by falsy-or checks
    with pytest.raises(ValueError, match="initial_rank must be >= 1"):
        CMPSConfig().parse("initial_rank=0")
    # kernel_stream knob: validation + the three auto_stream behaviors
    from audio_mps_tpu.ops.pallas_block import (STREAM_HBM_LIMIT,
                                                auto_stream)
    with pytest.raises(ValueError, match="kernel_stream must be"):
        CMPSConfig().parse("kernel_stream=yes")
    with pytest.raises(ValueError, match="kernel_stream='on' requires"):
        CMPSConfig().parse("kernel_stream=on,kernel_layout=split,"
                           "bond_dim=64")
    with pytest.raises(ValueError, match="kernel_stream='on' requires"):
        CMPSConfig().parse("kernel_stream=on,defer_norm=false,bond_dim=64")
    c_auto = CMPSConfig().parse("bond_dim=64")
    c_on = CMPSConfig().parse("bond_dim=64,kernel_stream=on")
    c_off = CMPSConfig().parse("bond_dim=64,kernel_stream=off")
    # auto: budget-gated (interpret=False mimics TPU)
    assert auto_stream(c_auto, 128, 1024, True, False) is True
    big_T = STREAM_HBM_LIMIT // (8 * 64 * 128) + 1
    assert auto_stream(c_auto, 128, big_T, True, False) is False
    # off: never; on: skips the budget, raises where unsupported
    assert auto_stream(c_off, 128, 1024, True, False) is False
    assert auto_stream(c_on, 128, big_T, True, False) is True
    with pytest.raises(ValueError, match="tile-aligned"):
        auto_stream(c_on, 96, 1024, True, False)
    with pytest.raises(ValueError, match="defer_norm"):
        auto_stream(c_on, 128, 1024, False, False)
    # end-to-end: kernel_stream=on routes stream=None through the
    # streamed kernels (interpret mode), value-equal to off
    from audio_mps_tpu.models.params import init_psi
    from audio_mps_tpu.ops.pallas_block import psi_nll_block_trainable
    base = CMPSConfig(bond_dim=8, minibatch_size=4, kernel_stream="off")
    p = init_psi(jax.random.PRNGKey(0), base)
    sig = damped_sine_batch(jax.random.PRNGKey(1), 4, 33, base.delta_t)
    l_off = psi_nll_block_trainable(p, base, sig, interpret=True,
                                    defer_norm=True)
    l_on = psi_nll_block_trainable(
        p, dataclasses.replace(base, kernel_stream="on"), sig,
        interpret=True, defer_norm=True)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-6)
    # kernel_pad_lanes knob: validation + it rides the hparams string
    # (padded-path numerics are pinned by test_pallas_block.py)
    with pytest.raises(ValueError, match="kernel_pad_lanes must be"):
        CMPSConfig().parse("kernel_pad_lanes=always")
    assert CMPSConfig().parse("kernel_pad_lanes=off").kernel_pad_lanes \
        == "off"


def test_train_cli_data_parallel_mesh(tmp_path):
    """--mesh=dp trains data-parallel over the virtual 8-device mesh
    through the real CLI path (replicated params, sharded batches) and
    the checkpoint restores; --mesh=dp:N and validation both work."""
    from audio_mps_tpu.train import train
    from audio_mps_tpu.config import RunConfig

    run = RunConfig(mps_model="psi_mps", dataset="damped_sine",
                    sample_duration=128, max_steps=3, summary_every=10,
                    visualize=False, num_samples=0, mesh="dp",
                    logdir=str(tmp_path), checkpoint_secs=1e9,
                    hparams="bond_dim=4,minibatch_size=8,scan_chunk=32")
    params, metrics = train(run, verbose=False)
    assert np.isfinite(float(metrics["model_loss"]))

    # resume continues from the saved step on a smaller explicit mesh
    run2 = dataclasses.replace(run, mesh="dp:4", max_steps=5)
    params2, metrics2 = train(run2, verbose=False)
    assert np.isfinite(float(metrics2["model_loss"]))

    with pytest.raises(ValueError, match="mesh must be"):
        RunConfig(mesh="tp")
    with pytest.raises(ValueError, match="must be divisible"):
        bad = dataclasses.replace(run, mesh="dp:3")
        train(bad, verbose=False)


def test_train_cli_all_mesh_strategies_loss_parity(tmp_path):
    """Every --mesh strategy drives end-to-end through the real CLI
    (config persistence, checkpointing, summaries) and reproduces the
    single-device loss (VERDICT r3 item 3): rank-TP, temporal pipeline,
    DP x rank (2D), and DP x time (2D) — dp is covered by
    test_train_cli_data_parallel_mesh. (The pipeline's FUSED hot loop is
    pinned in test_parallel.py; on CPU the CLI auto-gate rides XLA.)"""
    from audio_mps_tpu.train import train

    base = RunConfig(mps_model="rho_mps", dataset="damped_sine",
                     sample_duration=129, max_steps=2, summary_every=10,
                     visualize=False, num_samples=0,
                     checkpoint_secs=1e9,
                     hparams="bond_dim=4,minibatch_size=8,scan_chunk=32")

    losses = {}
    for mesh in ("", "rank:4", "time:4", "dpxrank:2x4", "dpxtime:2x4",
                 "rankxtime:2x4", "dpxrankxtime:2x2x2"):
        run = dataclasses.replace(
            base, mesh=mesh,
            logdir=str(tmp_path / (mesh.replace(":", "_") or "single")))
        _, metrics = train(run, verbose=False)
        losses[mesh] = float(metrics["model_loss"])
    for mesh, v in losses.items():
        np.testing.assert_allclose(v, losses[""], rtol=5e-5, atol=1e-7,
                                   err_msg=f"--mesh={mesh}")

    # --fused=true forces the FUSED temporal pipeline on the dpxtime
    # 2D mesh and the full 3D DP x TP x PP mesh (auto stays on the XLA
    # paths off-TPU); same loss through the CLI
    for mesh in ("dpxtime:2x4", "dpxrankxtime:2x2x2"):
        run_f = dataclasses.replace(
            base, mesh=mesh, fused="true",
            logdir=str(tmp_path / (mesh.replace(":", "_") + "_fused")))
        _, metrics_f = train(run_f, verbose=False)
        np.testing.assert_allclose(float(metrics_f["model_loss"]),
                                   losses[""], rtol=5e-5, atol=1e-7,
                                   err_msg=f"--mesh={mesh} --fused=true")


def test_train_cli_latent_time_mesh_loss_parity(tmp_path):
    """The latent family drives the temporal pipeline from the CLI —
    both --mesh=time:N and the DP x time 2D mesh (--mesh=dpxtime:AxB):
    same seed -> same reparameterization noise -> the pipelined ELBO
    reproduces the single-device latent CLI loss."""
    from audio_mps_tpu.train import train

    base = RunConfig(mps_model="latent", dataset="damped_sine",
                     sample_duration=129, max_steps=2, summary_every=10,
                     visualize=False, num_samples=0, checkpoint_secs=1e9,
                     hparams="bond_dim=4,minibatch_size=8,scan_chunk=32,"
                             "latent_dim=4,latent_hidden=16")

    _, m_ref = train(dataclasses.replace(
        base, logdir=str(tmp_path / "single")), verbose=False)
    for mesh in ("time:4", "dpxtime:2x4"):
        _, m_time = train(dataclasses.replace(
            base, mesh=mesh,
            logdir=str(tmp_path / mesh.replace(":", "_"))), verbose=False)
        np.testing.assert_allclose(float(m_time["model_loss"]),
                                   float(m_ref["model_loss"]),
                                   rtol=5e-5, atol=1e-7,
                                   err_msg=f"--mesh={mesh}")
        np.testing.assert_allclose(float(m_time["kl"]), float(m_ref["kl"]),
                                   rtol=5e-5, atol=1e-7,
                                   err_msg=f"--mesh={mesh}")


def test_train_cli_rank_mesh_resume_and_validation(tmp_path):
    """rank-TP checkpoints restore across mesh changes (rank:4 ->
    single-device -> rank:2), and the CLI rejects bad strategy shapes
    with actionable errors."""
    from audio_mps_tpu.train import train

    run = RunConfig(mps_model="rho_mps", dataset="damped_sine",
                    sample_duration=129, max_steps=2, summary_every=10,
                    visualize=False, num_samples=0, mesh="rank:4",
                    logdir=str(tmp_path), checkpoint_secs=1e9,
                    hparams="bond_dim=4,minibatch_size=4,scan_chunk=32")
    _, m1 = train(run, verbose=False)
    assert np.isfinite(float(m1["model_loss"]))
    # resume on a different placement (single device), then back on TP
    _, m2 = train(dataclasses.replace(run, mesh="", max_steps=4),
                  verbose=False)
    _, m3 = train(dataclasses.replace(run, mesh="rank:2", max_steps=6),
                  verbose=False)
    assert np.isfinite(float(m3["model_loss"]))

    with pytest.raises(ValueError, match="rho_mps strategy"):
        train(dataclasses.replace(run, mps_model="psi_mps",
                                  logdir=str(tmp_path / "x")),
              verbose=False)
    with pytest.raises(ValueError, match="rank 4 must be divisible"):
        train(dataclasses.replace(run, mesh="rank:3",
                                  logdir=str(tmp_path / "y")),
              verbose=False)
    with pytest.raises(ValueError, match="time axis"):
        train(dataclasses.replace(run, mesh="dpxtime:2x3",
                                  logdir=str(tmp_path / "z")),
              verbose=False)
    with pytest.raises(ValueError, match="mesh must be"):
        RunConfig(mesh="dpxrank:2")
    with pytest.raises(ValueError, match="mesh must be"):
        RunConfig(mesh="rank:0")


def test_train_cli_mesh_validation_up_front(tmp_path):
    """Review-r4 regressions: malformed 'dp:'/'rank:' specs (trailing colon,
    empty N) are parse errors rather than silently meaning all-devices;
    dpxrank catches rank % model-axis before building the step (same
    up-front contract as rank:N); the pscan time_chunk is always a
    divisor. (dpxtime --fused=true is now SUPPORTED — the fused temporal
    pipeline — and has its own positive CLI test above.)"""
    from audio_mps_tpu.train import _pscan_time_chunk, train

    with pytest.raises(ValueError, match="mesh must be"):
        RunConfig(mesh="dp:")
    with pytest.raises(ValueError, match="mesh must be"):
        RunConfig(mesh="rank:")

    run = RunConfig(mps_model="rho_mps", dataset="damped_sine",
                    sample_duration=129, max_steps=1, visualize=False,
                    num_samples=0, logdir=str(tmp_path),
                    checkpoint_secs=1e9,
                    hparams="bond_dim=4,minibatch_size=8,scan_chunk=32")
    with pytest.raises(ValueError, match="rank 4 must be divisible by the "
                                         "model axis size 3"):
        train(dataclasses.replace(run, mesh="dpxrank:2x3"), verbose=False)

    # largest divisor <= cap — never the bare min() that crashed t_c=1280
    assert _pscan_time_chunk(1280) == 640
    assert _pscan_time_chunk(32) == 32
    assert _pscan_time_chunk(1025) == 205
    assert _pscan_time_chunk(2048) == 1024
