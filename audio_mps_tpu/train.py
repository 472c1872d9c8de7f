"""Training CLI — the primary entry point (reference: train.py).

    python -m audio_mps_tpu.train --mps_model=psi_mps --dataset=damped_sine \
        --hparams="bond_dim=8,learning_rate=0.001" --logdir=./logging

Builds data -> model -> total loss (+ h_reg/r_reg, reference: train.py:55-60)
-> Adam -> managed loop with 60 s checkpointing into the run-parameterized
logdir ``{logdir}/{dataset}/{bond_dim}_{delta_t}_{minibatch_size}``
(reference: train.py:93-94), TensorBoard summaries in all four reference
modalities (reference: train.py:62-85), and restore-on-restart.
"""
from __future__ import annotations

import dataclasses
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from . import summaries as summaries_lib
from .config import CMPSConfig, RunConfig, parse_argv
from .data import get_audio
from .models import core
from .training import Checkpointer, init_params_for, make_train_step


def _pscan_time_chunk(t_c: int, cap: int = 1024) -> int:
    """Largest divisor of the per-stage step count <= cap (the time-sharded
    pscan requires time_chunk | per-chip steps, so a bare min(cap, t_c)
    would crash valid configs like t_c=1280)."""
    return max(c for c in range(1, min(cap, t_c) + 1) if t_c % c == 0)


def train(run: RunConfig, cfg: CMPSConfig = None, verbose: bool = True):
    """Run the training loop; returns (params, final metrics)."""
    cfg = cfg if cfg is not None else CMPSConfig().parse(run.hparams)
    key = jax.random.PRNGKey(run.seed)   # reference seeds TF with 0: train.py:13
    key, init_key = jax.random.split(key)

    stream = {"auto": None, "true": True, "false": False}[run.stream]
    data_iter = get_audio(run.datadir, run.dataset, cfg,
                          sample_duration=run.sample_duration, seed=run.seed,
                          stream=stream)

    params = init_params_for(run.mps_model, init_key, cfg)
    fused = {"auto": None, "true": True, "false": False}[run.fused]
    mesh = None          # set only for the dp strategy (explicit batch
    # sharding + replicated-param placement on restore); the other
    # strategies take plain arrays — their shard_maps place internally
    if run.mesh:
        from .config import parse_mesh_spec
        kind, dims = parse_mesh_spec(run.mesh)
        n_dev = len(jax.devices())
        if kind == "dp":
            # data-parallel over the local devices: replicated params,
            # batch sharded each step, pmean'd grads
            from .parallel import (make_dp_train_step, make_mesh,
                                   replicate, shard_batch)
            n = dims or n_dev
            mesh = make_mesh(n)
            if cfg.minibatch_size % n:
                raise ValueError(
                    f"minibatch_size={cfg.minibatch_size} must be "
                    f"divisible by the {n}-device mesh size "
                    f"(--mesh={run.mesh})")
            optimizer, step_fn = make_dp_train_step(run.mps_model, cfg,
                                                    mesh, fused=fused)
            params = replicate(params, mesh)
            opt_state = replicate(optimizer.init(params), mesh)
        elif kind == "rank":
            # purification-rank tensor parallelism (rho family)
            if run.mps_model != "rho_mps":
                raise ValueError(
                    f"--mesh={run.mesh} shards the purification rank — "
                    f"a rho_mps strategy (got {run.mps_model})")
            from .parallel import make_model_mesh, make_rank_train_step
            n = dims or n_dev
            if n > n_dev:
                raise ValueError(f"requested {n} devices, have {n_dev}")
            rank = (cfg.initial_rank if cfg.initial_rank is not None
                    else cfg.bond_dim)
            if rank % n:
                raise ValueError(
                    f"purification rank {rank} must be divisible by the "
                    f"{n}-device mesh size (--mesh={run.mesh})")
            optimizer, step_fn = make_rank_train_step(
                cfg, make_model_mesh(n), fused=fused)
            opt_state = optimizer.init(params)
        elif kind == "time":
            # temporal pipeline over the local devices (both families);
            # fused=auto rides the carried-state partials kernels
            from .parallel import make_time_mesh, make_time_train_step
            n = dims or n_dev
            if n > n_dev:
                raise ValueError(f"requested {n} devices, have {n_dev}")
            if (run.sample_duration - 1) % n:
                raise ValueError(
                    f"sample_duration-1={run.sample_duration - 1} must be "
                    f"divisible by the {n}-stage pipeline "
                    f"(--mesh={run.mesh})")
            optimizer, step_fn = make_time_train_step(
                run.mps_model, cfg, make_time_mesh(n), fused=fused)
            opt_state = optimizer.init(params)
        elif kind == "dpxrank":
            # combined 2D (data x model) mesh: DP x rank-TP
            if run.mps_model != "rho_mps":
                raise ValueError(
                    f"--mesh={run.mesh} shards the purification rank — "
                    f"a rho_mps strategy (got {run.mps_model})")
            from .parallel import (make_2d_rank_mesh,
                                   make_dp_rank_train_step)
            a, b = dims
            if a * b > n_dev:
                raise ValueError(f"requested {a}x{b} devices, have {n_dev}")
            if cfg.minibatch_size % a:
                raise ValueError(
                    f"minibatch_size={cfg.minibatch_size} must be "
                    f"divisible by the data axis size {a} "
                    f"(--mesh={run.mesh})")
            rank = (cfg.initial_rank if cfg.initial_rank is not None
                    else cfg.bond_dim)
            if rank % b:
                raise ValueError(
                    f"purification rank {rank} must be divisible by the "
                    f"model axis size {b} (--mesh={run.mesh})")
            optimizer, step_fn = make_dp_rank_train_step(
                cfg, make_2d_rank_mesh(a, b), fused=fused)
            opt_state = optimizer.init(params)
        elif kind in ("rankxtime", "dpxrankxtime"):
            # rank-TP x temporal pipeline, optionally x DP: the full
            # (data, model, time) 3D mesh (rho family)
            if run.mps_model != "rho_mps":
                raise ValueError(
                    f"--mesh={run.mesh} shards the purification rank — "
                    f"a rho_mps strategy (got {run.mps_model})")
            from .parallel import (make_3d_mesh,
                                   make_dp_rank_time_train_step)
            a, b, c = (1,) + dims if kind == "rankxtime" else dims
            if a * b * c > n_dev:
                raise ValueError(
                    f"requested {a}x{b}x{c} devices, have {n_dev}")
            if cfg.minibatch_size % a:
                raise ValueError(
                    f"minibatch_size={cfg.minibatch_size} must be "
                    f"divisible by the data axis size {a} "
                    f"(--mesh={run.mesh})")
            rank = (cfg.initial_rank if cfg.initial_rank is not None
                    else cfg.bond_dim)
            if rank % b:
                raise ValueError(
                    f"purification rank {rank} must be divisible by the "
                    f"model axis size {b} (--mesh={run.mesh})")
            if (run.sample_duration - 1) % c:
                raise ValueError(
                    f"sample_duration-1={run.sample_duration - 1} must be "
                    f"divisible by the time axis size {c} "
                    f"(--mesh={run.mesh})")
            optimizer, step_fn = make_dp_rank_time_train_step(
                cfg, make_3d_mesh(a, b, c), fused=fused)
            opt_state = optimizer.init(params)
        else:   # dpxtime
            # combined 2D (data x time) mesh: DP x sequence parallelism
            from .parallel import make_2d_mesh, make_dp_time_train_step
            a, b = dims
            if a * b > n_dev:
                raise ValueError(f"requested {a}x{b} devices, have {n_dev}")
            if cfg.minibatch_size % a:
                raise ValueError(
                    f"minibatch_size={cfg.minibatch_size} must be "
                    f"divisible by the data axis size {a} "
                    f"(--mesh={run.mesh})")
            if (run.sample_duration - 1) % b:
                raise ValueError(
                    f"sample_duration-1={run.sample_duration - 1} must be "
                    f"divisible by the time axis size {b} "
                    f"(--mesh={run.mesh})")
            optimizer, step_fn = make_dp_time_train_step(
                run.mps_model, cfg, make_2d_mesh(a, b), fused=fused,
                time_chunk=_pscan_time_chunk((run.sample_duration - 1) // b))
            opt_state = optimizer.init(params)
        if verbose:
            print(f"--mesh={run.mesh} ({kind}) over "
                  f"{jax.devices()[0].platform} devices", flush=True)
    else:
        optimizer, step_fn = make_train_step(run.mps_model, cfg,
                                             fused=fused)
        opt_state = optimizer.init(params)

    logdir = run.run_logdir(cfg)
    os.makedirs(logdir, exist_ok=True)
    # persist the run+model config so sampling can restore without
    # re-specifying hparams
    with open(os.path.join(logdir, "config.json"), "w") as f:
        json.dump({"cfg": dataclasses.asdict(cfg),
                   "run": dataclasses.asdict(run)}, f, indent=1)
    ckpt = Checkpointer(logdir + "/checkpoints",
                        save_secs=run.checkpoint_secs)
    params, opt_state, start_step = ckpt.restore(params, opt_state)
    if mesh is not None and start_step:
        # a restored checkpoint carries ITS run's sharding (possibly a
        # different mesh size); re-place onto the current mesh
        from .parallel import replicate
        params = replicate(params, mesh)
        opt_state = replicate(opt_state, mesh)
    elif run.mesh and start_step:
        # rank/2D strategies: their shard_maps place internally, but the
        # restored arrays may sit on a DIFFERENT previous mesh — pull to
        # host so the jitted step re-places them
        params = jax.tree.map(np.asarray, params)
        opt_state = jax.tree.map(np.asarray, opt_state)
    writer = summaries_lib.make_writer(logdir)

    if run.mps_model == "latent":
        from .models.latent import sample_latent
        sample_fn = sample_latent
    else:
        sample_fn = (core.sample_rho if run.mps_model == "rho_mps"
                     else core.sample_psi)
    latent = run.mps_model == "latent"
    metrics = {}
    step = start_step
    profiling = False
    try:
        while run.max_steps <= 0 or step < run.max_steps:
            # jax.profiler trace of a few steps (SURVEY.md §5 tracing plan)
            if run.profile_steps > 0 and step == start_step + 2:
                jax.profiler.start_trace(logdir + "/profile")
                profiling = True
            if profiling and step >= start_step + 2 + run.profile_steps:
                jax.profiler.stop_trace()
                profiling = False
            batch = jnp.asarray(next(data_iter))
            if mesh is not None:
                batch = shard_batch(batch, mesh)
            if latent:
                key, lkey = jax.random.split(key)
                params, opt_state, metrics = step_fn(params, opt_state,
                                                     batch, lkey)
            else:
                params, opt_state, metrics = step_fn(params, opt_state,
                                                     batch)
            step += 1

            if step % run.summary_every == 0 or step == start_step + 1:
                m = {k: float(v) for k, v in metrics.items()}
                if verbose:
                    print(f"step {step}: loss={m['model_loss']:.6f} "
                          f"total={m['total_loss']:.6f}", flush=True)
                samples = None
                if run.visualize and run.num_samples > 0 and writer is not None:
                    key, skey = jax.random.split(key)
                    samples = sample_fn(params, cfg, skey, run.num_samples,
                                        run.sample_duration)
                summaries_lib.write_step_summaries(
                    writer, step, m, cfg, run, params=params,
                    data=np.asarray(batch), samples=samples)
            ckpt.maybe_save(step, params, opt_state)
    except KeyboardInterrupt:
        if verbose:
            print("interrupted; saving final checkpoint", flush=True)
    finally:
        if profiling:
            jax.profiler.stop_trace()
        ckpt.maybe_save(step, params, opt_state, force=True)
        ckpt.close()
        if writer is not None:
            writer.close()
    return params, metrics


def main(argv=None):
    run = parse_argv(sys.argv[1:] if argv is None else argv)
    train(run)


if __name__ == "__main__":
    main()
