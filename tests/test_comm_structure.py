"""Communication-STRUCTURE tests: walk the traced jaxpr of each sharded
loss / train step and pin where the collectives sit relative to the time
loop. This is the one property of the multi-chip design that value-parity
tests cannot see and single-chip hardware cannot measure: a strategy can
be numerically exact while hiding a per-step collective that would ride
the 65k-step hot loop on a real mesh (the ~7x XLA-scan cliff VERDICT r3
item 2 closed).

Claims pinned here (each documented in the strategy's module docstring):
- rank_parallel.rho_nll_rank_sharded_fused: ONE all_gather of the whole
  partials stream, and NO collective inside any scan/while — including
  through the gradient (the all_gather transpose becomes a top-level
  reduce_scatter/psum, never a per-step op).
- rank_parallel.rho_nll_rank_sharded (the XLA path): one [2,B] psum per
  step INSIDE the scan — the positive control proving this walker
  detects per-step communication when it exists.
- data_parallel.make_dp_train_step: collectives only at gradient
  reduction / loss pmean, never inside the time loop.
- time_pscan.rho_nll_time_sharded: boundary exchange via gathers outside
  the local scans (the 100%-parallel-efficiency structure), values and
  gradients.
- time_pipeline.psi_nll_pipelined: ppermute INSIDE the stage loop is the
  design (microbatch handoff) — pinned as ppermute-only in-loop traffic.

Tracing only (jax.make_jaxpr): nothing is compiled or executed, so these
are cheap. Reference hot loop being protected: model.py:132-142.
"""
import dataclasses
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.training import init_params_for

COLLECTIVES = ("psum", "pmean", "all_gather", "ppermute", "all_to_all",
               "psum_invariant", "all_gather_invariant", "reduce_scatter")
LOOPS = ("scan", "while")

CFG = CMPSConfig(bond_dim=4, minibatch_size=4, scan_chunk=8)


def _walk(jaxpr, out, in_loop):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        out.append((name, in_loop))
        child = in_loop or name in LOOPS
        for v in eqn.params.values():
            vs = v if isinstance(v, (list, tuple)) else (v,)
            for x in vs:
                if hasattr(x, "eqns"):
                    _walk(x, out, child)
                elif hasattr(getattr(x, "jaxpr", None), "eqns"):
                    _walk(x.jaxpr, out, child)


def collectives_by_loop(fn, *args):
    """Counter of (collective primitive name, inside-a-scan/while bool)
    over the traced jaxpr of fn(*args)."""
    out = []
    _walk(jax.make_jaxpr(fn)(*args).jaxpr, out, False)
    return Counter((n, l) for n, l in out if n in COLLECTIVES)


def in_loop(counts):
    return {k: v for k, v in counts.items() if k[1]}


def _rho_fixture():
    params = init_params_for("rho_mps", jax.random.PRNGKey(0), CFG)
    sig = jnp.asarray(np.random.RandomState(0).randn(4, 17), jnp.float32)
    return params, sig


@pytest.mark.smoke
def test_fused_rank_tp_one_gather_no_per_step_collectives():
    from audio_mps_tpu.parallel.rank_parallel import (
        make_model_mesh, rho_nll_rank_sharded_fused)
    params, sig = _rho_fixture()
    mesh = make_model_mesh(4)

    fwd = collectives_by_loop(
        lambda p: rho_nll_rank_sharded_fused(p, CFG, sig, mesh,
                                             interpret=True), params)
    assert fwd[("all_gather", False)] == 1, fwd
    assert not in_loop(fwd), f"per-step collective leaked in: {fwd}"

    grad = collectives_by_loop(
        jax.grad(lambda p: rho_nll_rank_sharded_fused(
            p, CFG, sig, mesh, interpret=True)), params)
    assert grad[("all_gather", False)] == 1, grad
    assert not in_loop(grad), (
        f"the all_gather transpose must stay outside the time loop: {grad}")


def test_xla_rank_tp_per_step_psum_is_detectable():
    """Positive control: the XLA rank-sharded path's documented one-psum-
    per-step (rank_parallel.py) shows up as an IN-LOOP psum, proving the
    walker would catch a regression of the fused path."""
    from audio_mps_tpu.parallel.rank_parallel import (make_model_mesh,
                                                      rho_nll_rank_sharded)
    params, sig = _rho_fixture()
    mesh = make_model_mesh(4)
    fwd = collectives_by_loop(
        lambda p: rho_nll_rank_sharded(p, CFG, sig, mesh), params)
    assert fwd[("psum", True)] >= 1, fwd
    grad = collectives_by_loop(
        jax.grad(lambda p: rho_nll_rank_sharded(p, CFG, sig, mesh)), params)
    assert grad[("psum", True)] >= 1, grad


@pytest.mark.parametrize("mps_model", ["psi_mps", "rho_mps"])
def test_dp_step_collectives_outside_time_loop(mps_model):
    from audio_mps_tpu.parallel import (make_dp_train_step, make_mesh,
                                        replicate)
    params = init_params_for(mps_model, jax.random.PRNGKey(0), CFG)
    sig = jnp.asarray(np.random.RandomState(0).randn(4, 17), jnp.float32)
    mesh = make_mesh(4)
    opt, step = make_dp_train_step(mps_model, CFG, mesh, fused=False)
    pr = replicate(params, mesh)
    st = replicate(opt.init(params), mesh)
    counts = collectives_by_loop(step, pr, st, sig)
    assert sum(counts.values()) >= 1, "DP step must reduce gradients"
    assert not in_loop(counts), (
        f"DP traffic belongs at gradient reduction only: {counts}")


def test_time_sharded_pscan_collectives_outside_local_scans():
    from audio_mps_tpu.parallel.time_pipeline import make_time_mesh
    from audio_mps_tpu.parallel.time_pscan import rho_nll_time_sharded
    cfg = dataclasses.replace(CFG, scan_chunk=0)
    params = init_params_for("rho_mps", jax.random.PRNGKey(0), cfg)
    sig = jnp.asarray(np.random.RandomState(1).randn(4, 8 * 8 + 1),
                      jnp.float32)
    mesh = make_time_mesh(8)
    fwd = collectives_by_loop(
        lambda p: rho_nll_time_sharded(p, cfg, sig, mesh), params)
    assert fwd.get(("all_gather", False), 0) >= 1, fwd
    assert not in_loop(fwd), fwd
    grad = collectives_by_loop(
        jax.grad(lambda p: rho_nll_time_sharded(p, cfg, sig, mesh)), params)
    assert not in_loop(grad), grad


def test_pipeline_in_loop_traffic_is_ppermute_only():
    """The temporal pipeline's design IS a per-stage handoff: the ancilla
    crosses stages via ppermute inside the microbatch loop. Pin that the
    in-loop traffic is exactly that — no reductions hiding in the loop."""
    from audio_mps_tpu.parallel.time_pipeline import (make_time_mesh,
                                                      psi_nll_pipelined)
    cfg = dataclasses.replace(CFG, scan_chunk=0)
    params = init_params_for("psi_mps", jax.random.PRNGKey(0), cfg)
    sig = jnp.asarray(np.random.RandomState(1).randn(4, 8 * 8 + 1),
                      jnp.float32)
    mesh = make_time_mesh(8)
    counts = collectives_by_loop(
        lambda p: psi_nll_pipelined(p, cfg, sig, mesh, num_microbatches=2),
        params)
    looped = in_loop(counts)
    assert looped, "pipeline must hand the ancilla across stages in-loop"
    assert all(k[0] == "ppermute" for k in looped), counts


def test_fused_pipeline_in_loop_traffic_is_ppermute_only():
    """The FUSED pipeline must keep the same comm structure as the XLA
    one: per-TICK ppermute handoffs only (the whole per-stage time chunk
    runs inside one kernel call), no reductions in the tick loop — values
    AND gradients (the ppermute transpose is another ppermute; the kernel
    VJP must not introduce per-step collectives)."""
    from audio_mps_tpu.parallel.time_pipeline import (
        make_time_mesh, psi_nll_pipelined_fused, rho_nll_pipelined_fused)
    cfg = dataclasses.replace(CFG, scan_chunk=0)
    sig = jnp.asarray(np.random.RandomState(1).randn(4, 8 * 8 + 1),
                      jnp.float32)
    mesh = make_time_mesh(8)
    for model, fn in (("psi_mps", psi_nll_pipelined_fused),
                      ("rho_mps", rho_nll_pipelined_fused)):
        params = init_params_for(model, jax.random.PRNGKey(0), cfg)
        counts = collectives_by_loop(
            lambda p: fn(p, cfg, sig, mesh, num_microbatches=2,
                         interpret=True), params)
        looped = in_loop(counts)
        assert looped, f"{model}: pipeline must hand off in-loop"
        assert all(k[0] == "ppermute" for k in looped), (model, counts)
        grad = collectives_by_loop(
            jax.grad(lambda p: fn(p, cfg, sig, mesh, num_microbatches=2,
                                  interpret=True)), params)
        assert all(k[0] == "ppermute" for k in in_loop(grad)), (model, grad)
