"""Randomized conformance sweep: block-layout fused kernels vs jax.grad
of the XLA scan across random (model, D, B, T, rank, defer, unroll)
configs — an out-of-suite stress companion to tests/test_pallas_block.py
(run it after kernel changes: `python tools/conformance_sweep.py [seed]`;
14 public-API cases + 6 batched spine/limbs-kernel cases + 6
streamed-states cases + 6 streamed rank-partials cases + 6 lane-padded
cases (kernel_pad_lanes='on') + 6 lane-padded rank-partials cases,
~18 min on one CPU; expect `FAILURES: 0`)."""
import os, sys, random
# only append XLA flags the caller hasn't set (same guard as
# tests/conftest.py)
_flags = os.environ.get("XLA_FLAGS", "")
for _flag in ("--xla_backend_optimization_level=0",
              "--xla_llvm_disable_expensive_passes=true"):
    if _flag.split("=")[0] not in _flags:
        _flags = (_flags + " " + _flag).strip()
os.environ["XLA_FLAGS"] = _flags
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core
from audio_mps_tpu.models.params import init_psi, init_rho
from audio_mps_tpu.ops.pallas_grad import (psi_nll_pallas_trainable,
                                           rho_nll_pallas_trainable)

rng = random.Random(int(sys.argv[1]) if len(sys.argv) > 1 else 0)
cases = []
for i in range(14):
    D = rng.choice([4, 8, 12, 16, 20])
    B = rng.choice([1, 2, 3, 5])
    T = rng.choice([17, 33, 49, 97, 130])
    rank = rng.choice([None, 1, 2, D // 2])
    defer = rng.choice([True, False])
    unroll = rng.choice([4, 8, 16])
    model = rng.choice(["psi", "rho"])
    cases.append((model, D, B, T, rank, defer, unroll))

fails = 0
for (model, D, B, T, rank, defer, unroll) in cases:
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=0,
                     initial_rank=rank if model == "rho" else None)
    data = damped_sine_batch(jax.random.PRNGKey(T + D), B, T, cfg.delta_t)
    tag = f"{model} D={D} B={B} T={T} rank={rank} defer={defer} u={unroll}"
    try:
        if model == "psi":
            pp = init_psi(jax.random.PRNGKey(D), cfg)
            ref_fn = core.psi_nll
            pal = lambda p: psi_nll_pallas_trainable(
                p, cfg, data, unroll=unroll, interpret=True,
                defer_norm=defer, layout="block")
        else:
            pp = init_rho(jax.random.PRNGKey(D), cfg)
            ref_fn = core.rho_nll_factor
            pal = lambda p: rho_nll_pallas_trainable(
                p, cfg, data, unroll=unroll, interpret=True,
                defer_norm=defer, layout="block")
        v_ref = float(ref_fn(pp, cfg, data))
        v_pal = float(pal(pp))
        g_ref = jax.grad(lambda p: ref_fn(p, cfg, data))(pp)
        g_pal = jax.grad(pal)(pp)
        ok = abs(v_pal - v_ref) < 1e-6 + 1e-5 * abs(v_ref)
        gerr = max(
            np.abs(np.asarray(a) - np.asarray(b)).max() /
            (np.abs(np.asarray(a)).max() + 1e-12)
            for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)))
        ok = ok and gerr < 3e-4
        print(("OK  " if ok else "FAIL") + f" {tag}  v={v_ref:+.5f} gerr={gerr:.1e}", flush=True)
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {tag}: {str(e)[:110]}", flush=True)
        fails += 1
# --- batched spine/limbs kernels (the TPU default for rho when
# B*rank % 128 == 0): randomized shapes vs jax.grad of the scan, via the
# factory's explicit batched=True knob (interpret mode has no alignment
# constraint, so small shapes exercise the same code path)
from audio_mps_tpu.models.cell import make_constants
from audio_mps_tpu.ops.pallas_block import (_psi_block_constants,
                                            _psi_block_factory,
                                            _psi_block_t0,
                                            _rho_block_constants,
                                            _rho_block_factory,
                                            _rho_block_t0,
                                            _rho_factor_inputs)
from audio_mps_tpu.ops.pallas_scan import _pad_rows
import jax.numpy as jnp

for i in range(6):
    D = rng.choice([4, 8, 16])
    B = rng.choice([1, 2, 3])
    T = rng.choice([17, 49, 97])
    unroll = rng.choice([4, 8])
    model = rng.choice(["psi", "rho"])
    rank = rng.choice([1, 2, D // 2]) if model == "rho" else None
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=0,
                     initial_rank=rank)
    data = damped_sine_batch(jax.random.PRNGKey(T + D + i), B, T,
                             cfg.delta_t)
    tag = f"batched {model} D={D} B={B} T={T} rank={rank} u={unroll}"
    try:
        n_blocks = max(1, -(-(T - 1) // unroll))
        t_pad = n_blocks * unroll
        if model == "psi":
            pp = init_psi(jax.random.PRNGKey(D + i), cfg)
            ref_fn = core.psi_nll

            def pal(p):
                cc = make_constants(p, cfg)
                incs = (data[:, 1:] - data[:, :-1]).T / cc.A
                se = _pad_rows(incs, t_pad)
                ab, bb, rb = _psi_block_constants(cc)
                pr0, pi0 = core.psi0(p, cfg)
                t0 = _psi_block_t0(cc, jnp.broadcast_to(pr0[:, None],
                                                        (D, B)),
                                   jnp.broadcast_to(pi0[:, None], (D, B)))
                fused = _psi_block_factory(cfg, B, T, unroll, True,
                                           "highest", True, True)
                return jnp.mean(fused(ab, bb, rb, t0, se))
        else:
            pp = init_rho(jax.random.PRNGKey(D + i), cfg)
            ref_fn = core.rho_nll_factor
            rk = rank or D

            def pal(p):
                cc = make_constants(p, cfg)
                incs = (data[:, 1:] - data[:, :-1]).T / cc.A
                seb = _pad_rows(incs, t_pad)
                se = jnp.repeat(seb, rk, axis=1)
                h0r, h0i, zmat = _rho_factor_inputs(p, cfg, B)
                ab, bb, xb = _rho_block_constants(cc)
                t0 = _rho_block_t0(cc, h0r, h0i)
                fused = _rho_block_factory(cfg, B, T, rk, unroll, True,
                                           "highest", True, True)
                return fused(ab, bb, xb, t0, se, seb, zmat, zmat.T)
        v_ref = float(ref_fn(pp, cfg, data))
        v_pal = float(pal(pp))
        g_ref = jax.grad(lambda p: ref_fn(p, cfg, data))(pp)
        g_pal = jax.grad(pal)(pp)
        ok = abs(v_pal - v_ref) < 1e-6 + 1e-5 * abs(v_ref)
        gerr = max(
            np.abs(np.asarray(a) - np.asarray(b)).max() /
            (np.abs(np.asarray(a)).max() + 1e-12)
            for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)))
        ok = ok and gerr < 3e-4
        print(("OK  " if ok else "FAIL") + f" {tag}  v={v_ref:+.5f} "
              f"gerr={gerr:.1e}", flush=True)
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {tag}: {str(e)[:110]}", flush=True)
        fails += 1

# --- streamed-states kernels (the r4 TPU default for lane-aligned
# configs): randomized shapes vs jax.grad of the scan, via the public
# stream=True knob (interpret mode has no alignment constraint)
from audio_mps_tpu.ops.pallas_block import (psi_nll_block_trainable,
                                            rho_nll_block_trainable)

for i in range(6):
    D = rng.choice([4, 8, 16])
    B = rng.choice([1, 2, 3])
    T = rng.choice([17, 49, 97])
    unroll = rng.choice([4, 8])
    model = rng.choice(["psi", "rho"])
    rank = rng.choice([1, 2, D // 2]) if model == "rho" else None
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=0,
                     initial_rank=rank)
    data = damped_sine_batch(jax.random.PRNGKey(T + D + 2 * i), B, T,
                             cfg.delta_t)
    tag = f"stream  {model} D={D} B={B} T={T} rank={rank} u={unroll}"
    try:
        if model == "psi":
            pp = init_psi(jax.random.PRNGKey(D + i), cfg)
            ref_fn = core.psi_nll
            pal = lambda p: psi_nll_block_trainable(
                p, cfg, data, unroll=unroll, interpret=True,
                defer_norm=True, stream=True)
        else:
            pp = init_rho(jax.random.PRNGKey(D + i), cfg)
            ref_fn = core.rho_nll_factor
            pal = lambda p: rho_nll_block_trainable(
                p, cfg, data, unroll=unroll, interpret=True,
                defer_norm=True, stream=True)
        v_ref = float(ref_fn(pp, cfg, data))
        v_pal = float(pal(pp))
        g_ref = jax.grad(lambda p: ref_fn(p, cfg, data))(pp)
        g_pal = jax.grad(pal)(pp)
        ok = abs(v_pal - v_ref) < 1e-6 + 1e-5 * abs(v_ref)
        gerr = max(
            np.abs(np.asarray(a) - np.asarray(b)).max() /
            (np.abs(np.asarray(a)).max() + 1e-12)
            for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)))
        ok = ok and gerr < 3e-4
        print(("OK  " if ok else "FAIL") + f" {tag}  v={v_ref:+.5f} "
              f"gerr={gerr:.1e}", flush=True)
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {tag}: {str(e)[:110]}", flush=True)
        fails += 1

# --- streamed rank-partials kernels (the r4 fused-TP / beyond-ceiling
# building block): randomized (rank_chunk, time_segment, stream) configs
# of rho_nll_rank_chunked vs jax.grad of the factor scan
from audio_mps_tpu.ops.pallas_rank import rho_nll_rank_chunked

for i in range(6):
    D = rng.choice([4, 8, 16])
    B = rng.choice([1, 2, 3])
    T = rng.choice([17, 49, 97])
    unroll = rng.choice([4, 8])
    rank = rng.choice([2, 4, D]) if D >= 4 else 4
    chunk = rng.choice([c for c in (1, 2, rank) if rank % c == 0])
    seg = rng.choice([None, 8, 24])
    stream = rng.choice([True, False])
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=0,
                     initial_rank=rank)
    data = damped_sine_batch(jax.random.PRNGKey(T + D + 3 * i), B, T,
                             cfg.delta_t)
    tag = (f"rankstream rho D={D} B={B} T={T} rank={rank} c={chunk} "
           f"seg={seg} stream={stream} u={unroll}")
    try:
        pp = init_rho(jax.random.PRNGKey(D + 2 * i), cfg)
        pal = lambda p: rho_nll_rank_chunked(
            p, cfg, data, rank_chunk=chunk, unroll=unroll,
            interpret=True, time_segment=seg, stream=stream)
        v_ref = float(core.rho_nll_factor(pp, cfg, data))
        v_pal = float(pal(pp))
        g_ref = jax.grad(lambda p: core.rho_nll_factor(p, cfg, data))(pp)
        g_pal = jax.grad(pal)(pp)
        ok = abs(v_pal - v_ref) < 1e-6 + 1e-5 * abs(v_ref)
        gerr = max(
            np.abs(np.asarray(a) - np.asarray(b)).max() /
            (np.abs(np.asarray(a)).max() + 1e-12)
            for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)))
        ok = ok and gerr < 3e-4
        print(("OK  " if ok else "FAIL") + f" {tag}  v={v_ref:+.5f} "
              f"gerr={gerr:.1e}", flush=True)
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {tag}: {str(e)[:110]}", flush=True)
        fails += 1

# --- lane-padded kernels (kernel_pad_lanes='on': psi pads B, rho pads
# the purification rank with zero factor rows — both to the next
# 128-lane multiple): public API vs jax.grad of the scan. Padding also
# changes auto_unroll, so the defer renorm points move: same 3e-4 grad
# gate, value gate eased to reordering tolerance.
for i in range(6):
    D = rng.choice([4, 8, 16])
    B = rng.choice([1, 2, 3, 5])
    T = rng.choice([17, 49, 97])
    model = rng.choice(["psi", "rho"])
    rank = rng.choice([1, 2, D // 2]) if model == "rho" else None
    stream = rng.choice([True, False])
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=0,
                     initial_rank=rank, kernel_pad_lanes="on")
    data = damped_sine_batch(jax.random.PRNGKey(T + D + 5 * i), B, T,
                             cfg.delta_t)
    tag = (f"padded {model} D={D} B={B} T={T} rank={rank} "
           f"stream={stream}")
    try:
        if model == "psi":
            pp = init_psi(jax.random.PRNGKey(D + 3 * i), cfg)
            ref_fn = core.psi_nll
            pal = lambda p: psi_nll_block_trainable(
                p, cfg, data, interpret=True, defer_norm=True,
                stream=stream)
        else:
            pp = init_rho(jax.random.PRNGKey(D + 3 * i), cfg)
            ref_fn = core.rho_nll_factor
            pal = lambda p: rho_nll_block_trainable(
                p, cfg, data, interpret=True, defer_norm=True,
                stream=stream)
        v_ref = float(ref_fn(pp, cfg, data))
        v_pal = float(pal(pp))
        g_ref = jax.grad(lambda p: ref_fn(p, cfg, data))(pp)
        g_pal = jax.grad(pal)(pp)
        ok = abs(v_pal - v_ref) < 1e-6 + 3e-5 * abs(v_ref)
        gerr = max(
            np.abs(np.asarray(a) - np.asarray(b)).max() /
            (np.abs(np.asarray(a)).max() + 1e-12)
            for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)))
        ok = ok and gerr < 3e-4
        print(("OK  " if ok else "FAIL") + f" {tag}  v={v_ref:+.5f} "
              f"gerr={gerr:.1e}", flush=True)
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {tag}: {str(e)[:110]}", flush=True)
        fails += 1

# --- lane-padded rank-partials (auto_pad_rank_partials: zero factor
# rows pad each chunk/shard's B*r_loc to the next 128 multiple — the
# alignment-free fused-TP / beyond-ceiling path): rho_nll_rank_chunked
# with kernel_pad_lanes='on' and deliberately misaligned chunks vs
# jax.grad of the factor scan, across (chunk, time_segment, stream).
for i in range(6):
    D = rng.choice([4, 8, 16])
    B = rng.choice([1, 2, 3, 5])
    T = rng.choice([17, 49, 97])
    unroll = rng.choice([4, 8])
    rank = rng.choice([2, 3, 5, D]) if D >= 4 else 4
    chunk = rng.choice([c for c in (1, 2, 3, rank) if rank % c == 0])
    seg = rng.choice([None, 8, 24])
    stream = rng.choice([True, False])
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B, scan_chunk=0,
                     initial_rank=rank, kernel_pad_lanes="on")
    data = damped_sine_batch(jax.random.PRNGKey(T + D + 7 * i), B, T,
                             cfg.delta_t)
    tag = (f"padrank rho D={D} B={B} T={T} rank={rank} c={chunk} "
           f"seg={seg} stream={stream} u={unroll}")
    try:
        pp = init_rho(jax.random.PRNGKey(D + 5 * i), cfg)
        pal = lambda p: rho_nll_rank_chunked(
            p, cfg, data, rank_chunk=chunk, unroll=unroll,
            interpret=True, time_segment=seg, stream=stream)
        v_ref = float(core.rho_nll_factor(pp, cfg, data))
        v_pal = float(pal(pp))
        g_ref = jax.grad(lambda p: core.rho_nll_factor(p, cfg, data))(pp)
        g_pal = jax.grad(pal)(pp)
        ok = abs(v_pal - v_ref) < 1e-6 + 3e-5 * abs(v_ref)
        gerr = max(
            np.abs(np.asarray(a) - np.asarray(b)).max() /
            (np.abs(np.asarray(a)).max() + 1e-12)
            for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pal)))
        ok = ok and gerr < 3e-4
        print(("OK  " if ok else "FAIL") + f" {tag}  v={v_ref:+.5f} "
              f"gerr={gerr:.1e}", flush=True)
        fails += 0 if ok else 1
    except Exception as e:
        print(f"ERR  {tag}: {str(e)[:110]}", flush=True)
        fails += 1

print("FAILURES:", fails, flush=True)
sys.exit(1 if fails else 0)
