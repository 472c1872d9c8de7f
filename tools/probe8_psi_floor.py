"""probe8: attack the psi fused-forward per-step floor (VERDICT r4 item 1).

probe7 (r3) decomposed the psi forward at D=64 B=128 "high" into ~270 ns
of MXU passes + ~700 ns/step of fixed cost inside the kernel (dependent-
dot latency + VPU). This probe measures forward-only NLL kernel VARIANTS
that restructure the serial chain:

  G=1 paired=False  — baseline: replica of the shipping defer forward
                      (hand-pipelined loss tail)
  G=2 paired=False  — 2-way cross-example interleave: batch halves run
                      independent recurrences whose dots overlap each
                      other's latency (half-width operands, same total
                      MXU cycles)
  G=4 paired=False  — 4-way interleave (quarter-width operands)
  G=1 paired=True   — operator pairing: y_{k+2} = AA t + s0 AB t
                      + s1 (BA t + s0 BB t) — 6 dots per 2 steps, ALL
                      independent on t_k, halving the serial depth at
                      +50% state passes
  G=2 paired=True   — pairing x interleave

Each variant is checked against core.psi_nll at short T first. Run on the
real chip:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe8_psi_floor.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core
from audio_mps_tpu.models.cell import make_constants
from audio_mps_tpu.models.params import init_psi
from audio_mps_tpu.ops.pallas_block import (_make_dot_ops, _dot,
                                            _psi_block_constants,
                                            _psi_block_t0)
from audio_mps_tpu.ops.pallas_scan import _full, _on_tpu, _pad_rows


def build_variant(cfg, K, precision, G, paired, B, T, interpret,
                  noloss=False):
    """noloss=True: STATE-CHAIN-ONLY diagnostic — the per-step work is
    exactly the two dependent state dots + operand prep, with the whole
    loss tail (R-matvec, two full-array VPU reductions, scalar math)
    stripped. Its ns/step attributes the fixed floor: chain-only time ~
    MXU passes => the floor is the loss tail's VPU work; chain-only time
    >> passes => it is dependent-dot latency."""
    H = B // G
    log_eps = cfg.log_eps if cfg.log_eps > 0 else float("-inf")
    norm_eps = cfg.norm_eps
    prep, dotf, _ = _make_dot_ops(precision)
    n_steps = T - 1
    nb = max(1, -(-n_steps // K))
    t_pad = nb * K
    D2 = 2 * cfg.bond_dim
    n_const = 7 if paired else 3

    def kernel(*args):
        se_refs = args[:G]
        t0_refs = args[G:2 * G]
        c_refs = args[2 * G:2 * G + n_const]
        loss_refs = args[2 * G + n_const:3 * G + n_const]
        t_ss = args[3 * G + n_const:4 * G + n_const]
        acc_ss = args[4 * G + n_const:5 * G + n_const]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            for g in range(G):
                t_ss[g][:] = t0_refs[g][:]
                acc_ss[g][:] = jnp.zeros_like(acc_ss[g])

        cs = [prep(r[:]) for r in c_refs]
        ab, bb, rb = cs[0], cs[1], cs[2]
        if paired:
            aa, ab2, ba, bb2 = cs[3:]
        accs = [r[:] for r in acc_ss]
        n2ps = [jnp.ones_like(a) for a in accs]
        ts = [r[:] for r in t_ss]
        tps = [prep(t) for t in ts]
        pend = [[] for _ in range(G)]

        def flush(g):
            acc = accs[g]
            for (y0, py0, s0, n2p0) in pend[g]:
                ru0 = dotf(rb, py0)
                ehat0 = 2.0 * jnp.sum(y0 * ru0, axis=0, keepdims=True)
                e0 = ehat0 / jnp.maximum(n2p0, norm_eps)
                acc = acc - jnp.log(jnp.maximum(1.0 + e0 * s0, log_eps))
            accs[g] = acc
            pend[g] = []

        if noloss:
            for k in range(K):
                for g in range(G):
                    s = se_refs[g][0, k:k + 1, :]
                    y = dotf(ab, tps[g]) + s * dotf(bb, tps[g])
                    tps[g] = prep(y)
                    ts[g] = y
            for g in range(G):
                n2 = jnp.sum(ts[g] * ts[g], axis=0, keepdims=True)
                inv = jax.lax.rsqrt(jnp.maximum(n2, norm_eps))
                t_ss[g][:] = ts[g] * inv
                acc_ss[g][:] = n2
                loss_refs[g][0] = n2
            return
        if not paired:
            for k in range(K):
                newp = []
                for g in range(G):
                    s = se_refs[g][0, k:k + 1, :]
                    y = dotf(ab, tps[g]) + s * dotf(bb, tps[g])
                    tps[g] = prep(y)
                    newp.append((y, tps[g], s))
                for g in range(G):
                    flush(g)
                    y, py, s = newp[g]
                    pend[g] = [(y, py, s, n2ps[g])]
                    n2ps[g] = jnp.sum(y * y, axis=0, keepdims=True)
                    ts[g] = y
        else:
            for j in range(K // 2):
                newp = []
                for g in range(G):
                    s0 = se_refs[g][0, 2 * j:2 * j + 1, :]
                    s1 = se_refs[g][0, 2 * j + 1:2 * j + 2, :]
                    tp = tps[g]
                    y1 = dotf(ab, tp) + s0 * dotf(bb, tp)
                    y2 = (dotf(aa, tp) + s0 * dotf(ab2, tp)
                          + s1 * (dotf(ba, tp) + s0 * dotf(bb2, tp)))
                    py1 = prep(y1)
                    tps[g] = prep(y2)
                    newp.append((y1, py1, s0, y2, tps[g], s1))
                for g in range(G):
                    flush(g)
                    y1, py1, s0, y2, py2, s1 = newp[g]
                    n2_1 = jnp.sum(y1 * y1, axis=0, keepdims=True)
                    pend[g] = [(y1, py1, s0, n2ps[g]),
                               (y2, py2, s1, n2_1)]
                    n2ps[g] = jnp.sum(y2 * y2, axis=0, keepdims=True)
                    ts[g] = y2
        for g in range(G):
            flush(g)
            inv = jax.lax.rsqrt(jnp.maximum(n2ps[g], norm_eps))
            t_ss[g][:] = ts[g] * inv
            acc_ss[g][:] = accs[g]
            loss_refs[g][0] = accs[g]

    sem = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=100 * 1024 * 1024)

    def run(params, signals):
        cc = make_constants(params, cfg)
        incs = (signals[:, 1:] - signals[:, :-1]).T / cc.A
        se = _pad_rows(incs, t_pad)
        abm, bbm, rbm = _psi_block_constants(cc)
        pr0, pi0 = core.psi0(params, cfg)
        pr0 = jnp.broadcast_to(pr0[:, None], (cfg.bond_dim, B))
        pi0 = jnp.broadcast_to(pi0[:, None], (cfg.bond_dim, B))
        t0 = _psi_block_t0(cc, pr0, pi0)
        consts = [abm, bbm, rbm]
        if paired:
            mm = functools.partial(_dot, precision="highest")
            consts += [mm(abm, abm), mm(abm, bbm), mm(bbm, abm),
                       mm(bbm, bbm)]
        se_gs = [se[:, g * H:(g + 1) * H].reshape(nb, K, H)
                 for g in range(G)]
        t0_gs = [t0[:, g * H:(g + 1) * H] for g in range(G)]
        in_specs = ([pl.BlockSpec((1, K, H), lambda i: (i, 0, 0))] * G
                    + [_full((D2, H))] * G
                    + [_full((D2, D2))] * n_const)
        out_specs = [pl.BlockSpec((1, 1, H), lambda i: (i, 0, 0))] * G
        out_shape = [jax.ShapeDtypeStruct((nb, 1, H), jnp.float32)] * G
        scratch = ([pltpu.VMEM((D2, H), jnp.float32)] * G
                   + [pltpu.VMEM((1, H), jnp.float32)] * G)
        outs = pl.pallas_call(
            kernel, grid=(nb,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, scratch_shapes=scratch,
            compiler_params=sem, interpret=interpret,
        )(*(se_gs + t0_gs + consts))
        return jnp.mean(jnp.concatenate([o[-1, 0] for o in outs]))

    return run


def main():
    interpret = not _on_tpu()
    # interpret mode is pathologically slow at the headline shape, so the
    # CPU correctness pass runs tiny shapes; on TPU use the real ones
    D, B, Tc, Kc = (8, 16, 65, 4) if interpret else (64, 128, 257, 16)
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B)
    params = init_psi(jax.random.PRNGKey(0), cfg)

    # correctness at short T
    sig_s = damped_sine_batch(jax.random.PRNGKey(1), B, Tc, cfg.delta_t)
    ref = float(core.psi_nll(params, cfg, sig_s))
    print(f"ref psi_nll (T={Tc}): {ref:.6f}", flush=True)
    variants = [(1, False), (2, False), (4, False), (1, True), (2, True)]
    for prec in ("high", "highest"):
        for G, paired in variants:
            run = build_variant(cfg, Kc, prec, G, paired, B, Tc,
                                interpret)
            v = float(jax.jit(run)(params, sig_s))
            tag = f"G={G} paired={paired} {prec}"
            err = abs(v - ref) / abs(ref)
            print(f"  {tag}: {v:.6f} rel-err {err:.2e}", flush=True)
            assert err < (3e-3 if prec != "highest" else 1e-4), tag

    if interpret:
        print("CPU interpret mode: correctness only, no timing")
        return

    # timing at the headline shape
    T = 16385
    D, B = 64, 128
    cfg = CMPSConfig(bond_dim=D, minibatch_size=B)
    params = init_psi(jax.random.PRNGKey(0), cfg)
    sig = damped_sine_batch(jax.random.PRNGKey(1), B, T, cfg.delta_t)
    tvariants = [(1, False, True)] + [(g, p, False) for g, p in variants]
    for prec in ("high", "highest"):
        print(f"--- timing {prec} (D={D} B={B} T={T})", flush=True)
        for G, paired, noloss in tvariants:
            run = jax.jit(build_variant(cfg, 16, prec, G, paired, B, T,
                                        False, noloss=noloss))
            for _ in range(2):
                out = run(params, sig)
            float(out)
            t0 = time.time()
            n = 8
            for _ in range(n):
                out = run(params, sig)
            loss = float(out)
            dt = (time.time() - t0) / n
            tag = "noloss (state chain only)" if noloss else \
                f"G={G} paired={paired}"
            print(f"  {tag}: {dt*1e3:.2f} ms "
                  f"({dt/(T-1)*1e9:.0f} ns/step) loss={loss:.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
