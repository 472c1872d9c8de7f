"""Rank-partials fused kernels (ops/pallas_rank.py): the rho family's
fused tensor-parallel / beyond-VMEM-ceiling path (VERDICT r3 items 2+4).

Pins, in interpret mode on the virtual 8-device CPU mesh:
- rank-CHUNKED NLL (single device, any chunking) == the XLA factor scan
  and the single-kernel fused path, values AND gradients;
- rank-SHARDED fused NLL (shard_map + one all_gather) == single device,
  1D model mesh and 2D (data x model) mesh, values AND gradients;
- the fused rank-TP and DP x rank train steps step identically to the
  single-device step;
- the VMEM-boundary helpers and validation errors.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core
from audio_mps_tpu.models.params import init_rho
from audio_mps_tpu.ops.pallas_block import rho_nll_block_trainable
from audio_mps_tpu.ops.pallas_rank import (combine_rank_partials,
                                           partials_supported,
                                           rank_chunk_for,
                                           rho_nll_rank_chunked,
                                           rho_nll_rank_partials)
from audio_mps_tpu.parallel.rank_parallel import (
    make_2d_rank_mesh, make_dp_rank_train_step, make_model_mesh,
    make_rank_train_step, rho_nll_rank_sharded_fused)
from audio_mps_tpu.training import make_train_step

CFG = CMPSConfig(bond_dim=8, minibatch_size=4, scan_chunk=16)
T = 65


def _sig(b=4, t=T):
    return damped_sine_batch(jax.random.PRNGKey(1), b, t, CFG.delta_t)


def _params(cfg=CFG):
    return init_rho(jax.random.PRNGKey(0), cfg)


GRAD_FIELDS = ("A", "Rx", "Ry", "freqs", "Wx", "Wy")


def _assert_grads_close(ga, gb, atol=5e-6):
    for name in GRAD_FIELDS:
        np.testing.assert_allclose(np.asarray(getattr(ga, name)),
                                   np.asarray(getattr(gb, name)),
                                   atol=atol, rtol=1e-4, err_msg=name)


@pytest.mark.parametrize("rank_chunk", [8, 4, 2, 1])
def test_chunked_matches_factor_scan_values(rank_chunk):
    params, sig = _params(), _sig()
    ref = float(core.rho_nll_factor(params, CFG, sig))
    got = float(rho_nll_rank_chunked(params, CFG, sig,
                                     rank_chunk=rank_chunk, unroll=4,
                                     interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_chunked_matches_single_kernel_fused():
    params, sig = _params(), _sig()
    one = float(rho_nll_block_trainable(params, CFG, sig, unroll=4,
                                        interpret=True, defer_norm=True))
    chunked = float(rho_nll_rank_chunked(params, CFG, sig, rank_chunk=4,
                                         unroll=4, interpret=True))
    np.testing.assert_allclose(chunked, one, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("rank_chunk", [4, 2])
def test_chunked_gradients_match_xla(rank_chunk):
    params, sig = _params(), _sig()
    g_ref = jax.grad(lambda p: core.rho_nll_factor(p, CFG, sig))(params)
    g_chk = jax.grad(lambda p: rho_nll_rank_chunked(
        p, CFG, sig, rank_chunk=rank_chunk, unroll=4,
        interpret=True))(params)
    _assert_grads_close(g_ref, g_chk)


def test_chunked_low_rank_and_uneven_unroll():
    """initial_rank < D plus an unroll that does not divide T-1 (padding
    path) — the padded partial rows must not leak into the loss."""
    cfg = CMPSConfig(bond_dim=8, minibatch_size=4, scan_chunk=16,
                     initial_rank=4)
    params = init_rho(jax.random.PRNGKey(0), cfg)
    sig = _sig(t=50)                      # T-1 = 49, unroll 4 -> pad 3
    ref = float(core.rho_nll_factor(params, cfg, sig))
    got = float(rho_nll_rank_chunked(params, cfg, sig, rank_chunk=2,
                                     unroll=4, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_partials_high_precision_close():
    """bf16x3 partials stay within the mode's own rounding of the fp32
    chunked value at short T."""
    params, sig = _params(), _sig()
    ref = float(rho_nll_rank_chunked(params, CFG, sig, rank_chunk=4,
                                     unroll=4, interpret=True))
    hi = float(rho_nll_rank_chunked(params, CFG, sig, rank_chunk=4,
                                    unroll=4, interpret=True,
                                    precision="high"))
    np.testing.assert_allclose(hi, ref, rtol=2e-3, atol=2e-4)


@pytest.mark.smoke
def test_combiner_single_group_identity():
    """One group with combine == the plain fused NLL (the chunked path
    with rank_chunk=rank)."""
    params, sig = _params(), _sig()
    eh, trp, gam, seb = rho_nll_rank_partials(params, CFG, sig, unroll=4,
                                              interpret=True)
    loss = combine_rank_partials(eh[None], trp[None], gam[None], seb, CFG)
    ref = core.rho_nll_factor(params, CFG, sig)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5,
                               atol=1e-6)


def test_rank_sharded_fused_matches_single_device():
    params, sig = _params(), _sig()
    mesh = make_model_mesh(4)
    fn = jax.jit(lambda p: rho_nll_rank_sharded_fused(
        p, CFG, sig, mesh, unroll=4, interpret=True))
    ref = float(core.rho_nll_factor(params, CFG, sig))
    np.testing.assert_allclose(float(fn(params)), ref, rtol=1e-5,
                               atol=1e-6)
    g_ref = jax.grad(lambda p: core.rho_nll_factor(p, CFG, sig))(params)
    g_sh = jax.jit(jax.grad(fn))(params)
    _assert_grads_close(g_ref, g_sh)


def test_rank_sharded_fused_2d_matches_single_device():
    params, sig = _params(), _sig(8)
    mesh = make_2d_rank_mesh(2, 4)
    fn = jax.jit(lambda p: rho_nll_rank_sharded_fused(
        p, CFG, sig, mesh, data_axis="data", unroll=4, interpret=True))
    ref = float(core.rho_nll_factor(params, CFG, sig))
    np.testing.assert_allclose(float(fn(params)), ref, rtol=1e-5,
                               atol=1e-6)
    g_ref = jax.grad(lambda p: core.rho_nll_factor(p, CFG, sig))(params)
    g_sh = jax.jit(jax.grad(fn))(params)
    _assert_grads_close(g_ref, g_sh)


def test_rank_train_step_matches_single_device():
    sig = _sig()
    opt_s, step_s = make_train_step("rho_mps", CFG, fused=False)
    p = _params()
    p_ref, _, m_ref = step_s(p, opt_s.init(p), sig)

    mesh = make_model_mesh(4)
    opt_t, step_t = make_rank_train_step(CFG, mesh, fused=True)
    p = _params()
    p_tp, _, m_tp = step_t(p, opt_t.init(p), sig)
    np.testing.assert_allclose(float(m_tp["model_loss"]),
                               float(m_ref["model_loss"]), rtol=1e-5)
    for name in GRAD_FIELDS:
        np.testing.assert_allclose(np.asarray(getattr(p_ref, name)),
                                   np.asarray(getattr(p_tp, name)),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_dp_rank_fused_train_step_matches_single_device():
    sig = _sig(8)
    opt_s, step_s = make_train_step("rho_mps", CFG, fused=False)
    p = _params()
    p_ref, _, m_ref = step_s(p, opt_s.init(p), sig)

    mesh = make_2d_rank_mesh(2, 4)
    opt_d, step_d = make_dp_rank_train_step(CFG, mesh, fused=True)
    p = _params()
    p_dp, _, m_dp = step_d(p, opt_d.init(p), sig)
    np.testing.assert_allclose(float(m_dp["model_loss"]),
                               float(m_ref["model_loss"]), rtol=1e-5)
    for name in GRAD_FIELDS:
        np.testing.assert_allclose(np.asarray(getattr(p_ref, name)),
                                   np.asarray(getattr(p_dp, name)),
                                   rtol=1e-4, atol=1e-6, err_msg=name)


def test_vmem_boundary_helpers():
    """rank_chunk_for reproduces the measured fused_supported boundary:
    full-rank D=256 at B=8 does NOT fit one kernel, but a chunk does —
    and the chunk it picks is a divisor that fits."""
    cfg = CMPSConfig(bond_dim=256, minibatch_size=8)
    assert not partials_supported(cfg, 8, 256)
    chunk = rank_chunk_for(cfg, 8, 256)
    assert chunk is not None and 256 % chunk == 0
    assert partials_supported(cfg, 8, chunk)
    # D=8 full rank trivially fits; the chunker picks the whole rank
    assert rank_chunk_for(CFG, 4, 8) == 8


def test_chunk_unroll_divisor_pick():
    """The carried-state chunk unroll is the LARGEST divisor of
    chunk_steps <= the auto/explicit pick — not gcd(pick, chunk), which
    collapses to 1 whenever the auto pick is coprime with the chunk
    (measured 3.5x regression: auto=5 over a 2^14-step chunk)."""
    from audio_mps_tpu.ops.pallas_grad import auto_unroll
    from audio_mps_tpu.ops.pallas_rank import rank_partials_chunk_unroll
    cfg = CMPSConfig(bond_dim=64, minibatch_size=8)
    auto = auto_unroll(2 * cfg.bond_dim, 8 * 64, None)
    if auto == 5:  # the shape that exposed the bug: 5 is coprime to 2^14
        assert rank_partials_chunk_unroll(cfg, 8, 64, 2 ** 14) == 4
    # general contract: a divisor, <= the pick, and maximal among divisors
    for steps, explicit in ((2 ** 14, 5), (96, 7), (96, 12), (7, 16), (1, 3)):
        u = rank_partials_chunk_unroll(cfg, 8, 64, steps, unroll=explicit)
        assert steps % u == 0 and 1 <= u <= max(1, explicit)
        assert not any(steps % d == 0 for d in range(u + 1, explicit + 1))


def test_validation_errors():
    params, sig = _params(), _sig()
    with pytest.raises(ValueError, match="divisible by rank_chunk"):
        rho_nll_rank_chunked(params, CFG, sig, rank_chunk=3,
                             interpret=True)
    cfg_bad = CMPSConfig(bond_dim=6, minibatch_size=4)
    p_bad = init_rho(jax.random.PRNGKey(0), cfg_bad)
    with pytest.raises(ValueError, match="block layout"):
        rho_nll_rank_partials(p_bad, cfg_bad, sig, interpret=True)
    mesh = make_model_mesh(3)
    with pytest.raises(ValueError, match="divisible by"):
        rho_nll_rank_sharded_fused(params, CFG, sig, mesh,
                                   interpret=True)


@pytest.mark.parametrize("precision", ["highest", "high"])
def test_streamed_partials_match_nonstreamed(precision):
    """Streamed-states rank-partials kernels (round 4): the forward
    streams every state to HBM and the backward drops its serial
    recompute chain — values AND gradients must match the non-streamed
    kernels and the XLA factor scan (fp32 to reassociation; bf16x3
    within its own rounding). Includes the padding path (unroll does
    not divide T-1)."""
    params, sig = _params(), _sig(t=50)       # T-1 = 49, unroll 4 -> pad
    tol = dict(rtol=1e-5, atol=1e-6) if precision == "highest" \
        else dict(rtol=2e-3, atol=2e-4)
    base = lambda p: rho_nll_rank_chunked(
        p, CFG, sig, rank_chunk=4, unroll=4, interpret=True,
        precision=precision, stream=False)
    strm = lambda p: rho_nll_rank_chunked(
        p, CFG, sig, rank_chunk=4, unroll=4, interpret=True,
        precision=precision, stream=True)
    np.testing.assert_allclose(float(strm(params)), float(base(params)),
                               **tol)
    if precision == "highest":
        ref = float(core.rho_nll_factor(params, CFG, sig))
        np.testing.assert_allclose(float(strm(params)), ref, rtol=1e-5,
                                   atol=1e-6)
        g_ref = jax.grad(lambda p: core.rho_nll_factor(p, CFG, sig))(params)
        _assert_grads_close(g_ref, jax.grad(strm)(params))
    else:
        g_base = jax.grad(base)(params)
        g_strm = jax.grad(strm)(params)
        _assert_grads_close(g_base, g_strm, atol=5e-4)


def test_streamed_sharded_and_segmented():
    """Stream composes with the rank-sharded TP path (values + grads vs
    single device) and with time segmentation (t_fin cotangent seeds the
    next segment's adjoint — the dtfin path only the streamed backward's
    _init exercises across segments)."""
    params, sig = _params(), _sig()
    ref = float(core.rho_nll_factor(params, CFG, sig))
    mesh = make_model_mesh(4)
    fn = jax.jit(lambda p: rho_nll_rank_sharded_fused(
        p, CFG, sig, mesh, unroll=4, interpret=True, stream=True))
    np.testing.assert_allclose(float(fn(params)), ref, rtol=1e-5,
                               atol=1e-6)
    g_ref = jax.grad(lambda p: core.rho_nll_factor(p, CFG, sig))(params)
    _assert_grads_close(g_ref, jax.jit(jax.grad(fn))(params))

    seg = lambda p: rho_nll_rank_chunked(p, CFG, sig, rank_chunk=4,
                                         unroll=4, interpret=True,
                                         time_segment=20, stream=True)
    np.testing.assert_allclose(float(seg(params)), ref, rtol=1e-5,
                               atol=1e-6)
    _assert_grads_close(g_ref, jax.grad(seg)(params))


@pytest.mark.parametrize("time_segment", [8, 20])
def test_time_segmented_matches_unsegmented(time_segment):
    """Time segmentation (scan of kernel calls chained through t_fin with
    per-segment remat) is exact: values AND grads match the unsegmented
    chunked path and the XLA scan — including a segment length that does
    not divide T-1 (padding crosses the final segment)."""
    params, sig = _params(), _sig()
    ref = float(core.rho_nll_factor(params, CFG, sig))
    fn = lambda p: rho_nll_rank_chunked(p, CFG, sig, rank_chunk=4,
                                        unroll=4, interpret=True,
                                        time_segment=time_segment)
    np.testing.assert_allclose(float(fn(params)), ref, rtol=1e-5,
                               atol=1e-6)
    g_ref = jax.grad(lambda p: core.rho_nll_factor(p, CFG, sig))(params)
    g_seg = jax.grad(fn)(params)
    _assert_grads_close(g_ref, g_seg)


def test_auto_time_segment_decision():
    """The time_segment=None resolver (auto_time_segment): checkpoint
    budget, the stream-fitting bound (measured winner at D=256 —
    tools/rankstream_bench.py), divisor preference, and its gates."""
    from audio_mps_tpu.ops.pallas_rank import auto_time_segment
    cfg = CMPSConfig(bond_dim=256, minibatch_size=8)
    # D=256 chunk=64 shapes: D2=512, BR=512 -> 1 MiB per block/step
    kw = dict(stream=None, interpret=False, hbm_groups=4)

    # the real D=256 T=16385 auto case (unroll=2 from auto_unroll):
    # ck budget 1024 blocks binds, 1024 | 8192 -> seg = 2048 steps,
    # whose per-segment stream (~2.1 GB) fits -> streaming stays ON
    assert auto_time_segment(cfg, 512, 512, 8192, 2, **kw) == 2048

    # larger unroll: the STREAM bound binds below the ck budget
    # (stream_blocks = (6*1024-1)//8 = 767 < 1024) and the divisor
    # preference lands on 512 | 2048 -> seg = 4096 steps
    assert auto_time_segment(cfg, 512, 512, 2048, 8, **kw) == 4096

    # stream gates OFF -> checkpoint budget alone (1024 | 2048)
    off = CMPSConfig(bond_dim=256, minibatch_size=8, kernel_stream="off")
    assert auto_time_segment(off, 512, 512, 2048, 8, **kw) == 8192

    # kernel_stream="on" (forced stream, segment left to us): the
    # stream-fitting bound applies too — better than paging
    on = CMPSConfig(bond_dim=256, minibatch_size=8, kernel_stream="on")
    assert auto_time_segment(on, 512, 512, 2048, 8, **kw) == 4096
    assert auto_time_segment(cfg, 512, 512, 2048, 8, stream=None,
                             interpret=True, hbm_groups=4) == 8192
    # unaligned lanes can't stream -> ck budget alone (2048 blocks of
    # 500 lanes: ck budget = 1 GiB // (512*500*4) = 1048 -> divisor 1024)
    assert auto_time_segment(cfg, 512, 500, 2048, 8, stream=None,
                             interpret=False, hbm_groups=4) == 8192
    # explicit stream=False skips the stream bound too
    assert auto_time_segment(cfg, 512, 512, 2048, 8, stream=False,
                             interpret=False, hbm_groups=4) == 8192

    # everything under budget -> no segmentation
    assert auto_time_segment(cfg, 512, 512, 16, 8, **kw) is None

    # COMBINED sibling-chunk streams bust the budget while one chunk's
    # whole-run stream would fit (n_blocks=1024, unroll=2: single stream
    # ~2 GiB, x4 groups ~8 GiB): force >= 2 checkpointed segments so
    # only one segment's stream is live -> seg = 512 blocks = 1024 steps
    assert auto_time_segment(cfg, 512, 512, 1024, 2, **kw) == 1024
    # ...but with one group the same shape needs no segmentation
    assert auto_time_segment(cfg, 512, 512, 1024, 2, stream=None,
                             interpret=False, hbm_groups=1) is None

    # prime-ish n_blocks: no divisor within 2x of the budget -> raw
    # budget with tail padding
    assert auto_time_segment(off, 512, 512, 1031, 8, **kw) == 8192


def test_chunked_stream_viable_predicate():
    """The gate training.nll_fn_for consults for beyond-ceiling
    'highest': structural streaming viability of the auto chunked path."""
    import dataclasses

    from audio_mps_tpu.ops.pallas_rank import chunked_stream_viable
    cfg = CMPSConfig(bond_dim=256, minibatch_size=8)
    assert chunked_stream_viable(cfg, 8, 64)            # 512 aligned lanes
    # unaligned chunk: lane padding (60 -> 64 zero rows) aligns it under
    # the default kernel_pad_lanes="auto"; with padding off it stays out
    assert chunked_stream_viable(cfg, 8, 60)
    assert not chunked_stream_viable(
        dataclasses.replace(cfg, kernel_pad_lanes="off"), 8, 60)
    assert not chunked_stream_viable(
        dataclasses.replace(cfg, kernel_stream="off"), 8, 64)
    assert not chunked_stream_viable(
        dataclasses.replace(cfg, defer_norm=False), 8, 64)


def test_rank_partials_lane_padding_exact():
    """Rank-partials lane padding (auto_pad_rank_partials): zero factor
    rows pad B*r_loc to the next 128 multiple — zero through the linear
    update, no contribution to the e/tr partial sums, tr0/gamma
    unchanged — so padded values AND gradients match the unpadded
    partials and the XLA factor scan. Misaligned on purpose (B=3,
    rank=5); pad forced with kernel_pad_lanes='on' (interpret)."""
    import dataclasses
    cfg = dataclasses.replace(CFG, minibatch_size=3, initial_rank=5)
    cfg_on = dataclasses.replace(cfg, kernel_pad_lanes="on")
    cfg_off = dataclasses.replace(cfg, kernel_pad_lanes="off")
    params, sig = _params(cfg), _sig(b=3, t=50)

    def nll(c):
        def f(p):
            eh, trp, gam, seb = rho_nll_rank_partials(p, c, sig,
                                                      unroll=4,
                                                      interpret=True)
            return combine_rank_partials(eh[None], trp[None], gam[None],
                                         seb, c)
        return f

    v_off, g_off = jax.value_and_grad(nll(cfg_off))(params)
    v_on, g_on = jax.value_and_grad(nll(cfg_on))(params)
    np.testing.assert_allclose(float(v_on), float(v_off), rtol=1e-5,
                               atol=1e-6)
    _assert_grads_close(g_off, g_on)
    ref = float(core.rho_nll_factor(params, cfg, sig))
    np.testing.assert_allclose(float(v_on), ref, rtol=1e-5, atol=1e-6)

    # streamed padded kernels: the pad is what makes stream legal on TPU
    # at misaligned shards; CPU-side the structure is pinned explicitly
    v_s, g_s = jax.value_and_grad(
        lambda p: rho_nll_rank_chunked(p, cfg_on, sig, rank_chunk=5,
                                       unroll=4, interpret=True,
                                       stream=True))(params)
    np.testing.assert_allclose(float(v_s), ref, rtol=1e-5, atol=1e-6)
    _assert_grads_close(g_off, g_s)


def test_rank_sharded_fused_padded_matches_single_device():
    """TP shards pad their LOCAL rows independently (pad resolves inside
    shard_map): a 4-way rank shard at B=3 (r_loc=2 -> misaligned 6
    lanes) with kernel_pad_lanes='on' reproduces the single-device
    unpadded NLL, values and gradients."""
    import dataclasses
    cfg = dataclasses.replace(CFG, minibatch_size=3)
    cfg_on = dataclasses.replace(cfg, kernel_pad_lanes="on")
    params, sig = _params(cfg), _sig(b=3)
    ref = float(core.rho_nll_factor(params, cfg, sig))
    mesh = make_model_mesh(4)
    fn = jax.jit(lambda p: rho_nll_rank_sharded_fused(
        p, cfg_on, sig, mesh, unroll=4, interpret=True))
    np.testing.assert_allclose(float(fn(params)), ref, rtol=1e-5,
                               atol=1e-6)
    g_ref = jax.grad(lambda p: core.rho_nll_factor(p, cfg, sig))(params)
    _assert_grads_close(g_ref, jax.jit(jax.grad(fn))(params))


def test_auto_pad_rank_partials_policy():
    """Pad-resolution policy: 'off' and aligned shapes are identity;
    'on' pads to the next B*r % 128 == 0 multiple (incl. interpret);
    'auto' never pads under interpret or with kernel_stream='off'."""
    import dataclasses

    from audio_mps_tpu.ops.pallas_rank import auto_pad_rank_partials
    cfg = CMPSConfig(bond_dim=8, minibatch_size=8)
    on = dataclasses.replace(cfg, kernel_pad_lanes="on")
    off = dataclasses.replace(cfg, kernel_pad_lanes="off")
    assert auto_pad_rank_partials(on, 8, 16, True) == 16     # aligned
    assert auto_pad_rank_partials(on, 8, 5, True) == 16      # 8*16=128
    assert auto_pad_rank_partials(on, 3, 5, True) == 128     # gcd(3,128)=1
    assert auto_pad_rank_partials(off, 8, 5, True) == 5
    assert auto_pad_rank_partials(cfg, 8, 5, True) == 5      # interpret
    assert auto_pad_rank_partials(
        dataclasses.replace(cfg, kernel_stream="off"), 8, 5, False) == 5
    # auto on "TPU" (interpret=False): pads when the padded kernel fits
    assert auto_pad_rank_partials(cfg, 8, 5, False) == 16
    # overshoot guard: B=12 r=8 would pad 96 -> 384 lanes (1 -> 3 MXU
    # tiles) — auto declines at EVERY D on the partials family (the
    # monolithic kernel's D<=8 win, PADRANK_r05, does NOT transfer:
    # the forced pad measured 1.095x SLOWER through rho_nll_rank_chunked
    # at D=8 — see the auto_pad_rank_partials comment); "on" forces
    assert auto_pad_rank_partials(cfg, 12, 8, False) == 8     # D=8: no
    cfg16 = dataclasses.replace(cfg, bond_dim=16)
    assert auto_pad_rank_partials(cfg16, 12, 8, False) == 8   # D=16: no
    assert auto_pad_rank_partials(
        dataclasses.replace(cfg16, kernel_pad_lanes="on"),
        12, 8, False) == 32
