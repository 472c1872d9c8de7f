"""Estimator-style chunked training driver.

Parity with the reference's legacy ``training_estimators.py`` (a
``tf.estimator`` custom Estimator trained in ``viz_steps`` chunks with a
checkpoint per chunk, reference: training_estimators.py:48-116 — note the
reference file is import-broken against its own model.py; this is the
working equivalent): an Estimator owns a model_dir, trains in bounded
chunks, checkpoints between chunks, and resumes automatically.

CLI (flags mirror training_estimators.py:16-39):

    python -m audio_mps_tpu.estimator --data_dir=data/pitch_30.tfrecords \
        --bond_d=10 --dt=0.001 --batch_size=32 --viz_steps=2 \
        --max_steps=5001 --discr=false --model_dir=/tmp/est
"""
from __future__ import annotations

import dataclasses
import os
import sys
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .config import CMPSConfig, _coerce
from .data import damped_sine_iterator, read_audio_tfrecords
from .data.pipeline import ArrayDataset
from .training import (Checkpointer, init_params_for, make_loss_fn,
                       make_train_step)


@dataclasses.dataclass(frozen=True)
class EstimatorConfig:
    """Flags of the legacy estimator entry point
    (reference: training_estimators.py:16-39)."""

    viz_steps: int = 2
    max_steps: int = 5001
    bond_d: int = 10
    dt: float = 0.001
    discr: bool = False         # False => pure state (psi), True => rho
    batch_size: int = 32
    model_dir: str = "/tmp/audio_mps_estimator"
    data_dir: str = ""          # empty => damped_sine synthetic
    sample_duration: int = 2 ** 16
    learning_rate: float = 1e-3
    seed: int = 0


_TYPES = {f.name: (type(f.default) if f.default is not None else str)
          for f in dataclasses.fields(EstimatorConfig)}


def parse_args(argv) -> EstimatorConfig:
    updates = {}
    for arg in argv:
        if not arg.startswith("--"):
            continue
        body = arg[2:]
        k, v = (body.split("=", 1) if "=" in body else (body, "true"))
        if k not in _TYPES:
            raise ValueError(f"unknown flag --{k}")
        updates[k] = _coerce(v, _TYPES[k])
    return dataclasses.replace(EstimatorConfig(), **updates)


class Estimator:
    """Owns a model_dir; trains in chunks with checkpoint-per-chunk and
    automatic resume (the reference's chunked ``estimator.train`` loop,
    training_estimators.py:105-115)."""

    def __init__(self, mps_model: str, cfg: CMPSConfig, model_dir: str,
                 save_checkpoints_steps=None, seed: int = 0):
        # None (default) = checkpoint once per train() call — exactly the
        # reference's checkpoint-per-viz-chunk cadence
        # (training_estimators.py:108-115, save_checkpoints_steps =
        # viz_steps with train(steps=viz_steps)). An int adds an
        # intra-call every-N-steps cadence on top.
        self.mps_model = mps_model
        self.cfg = cfg
        self.model_dir = model_dir
        self.save_checkpoints_steps = save_checkpoints_steps
        self.optimizer, self._step_fn = make_train_step(mps_model, cfg)
        # the latent family's ELBO takes a PRNG key; derive it from the
        # global step so chunked resume replays the identical stream
        self._latent = mps_model == "latent"
        if self._latent:
            from .training import make_latent_loss_fn
            self._loss_fn = jax.jit(make_latent_loss_fn(cfg))
            self._base_key = jax.random.PRNGKey(seed + 1)
        else:
            self._loss_fn = jax.jit(make_loss_fn(mps_model, cfg))
        self.params = init_params_for(mps_model, jax.random.PRNGKey(seed),
                                      cfg)
        self.opt_state = self.optimizer.init(self.params)
        self._ckpt = Checkpointer(os.path.join(model_dir, "checkpoints"),
                                  save_secs=0.0)
        self.params, self.opt_state, self.global_step = self._ckpt.restore(
            self.params, self.opt_state)
        # one persistent iterator per input_fn: re-creating a seeded
        # iterator every chunk would replay the same batches (the
        # reference's unseeded shuffle reshuffles per train() call)
        self._iters = {}

    def train(self, input_fn: Callable[[], Iterator], steps: int,
              verbose: bool = False):
        """Train `steps` steps, checkpointing every
        save_checkpoints_steps. The iterator persists across calls so
        chunked training advances through the data."""
        # keyed by the callable object itself (id() of a dead lambda can
        # be reused by CPython, serving a stale iterator)
        it = self._iters.get(input_fn)
        if it is None:
            it = self._iters[input_fn] = input_fn()
        metrics = {}
        for _ in range(steps):
            batch = jnp.asarray(next(it))
            if self._latent:
                key = jax.random.fold_in(self._base_key, self.global_step)
                self.params, self.opt_state, metrics = self._step_fn(
                    self.params, self.opt_state, batch, key)
            else:
                self.params, self.opt_state, metrics = self._step_fn(
                    self.params, self.opt_state, batch)
            self.global_step += 1
            if (self.save_checkpoints_steps
                    and self.global_step % self.save_checkpoints_steps == 0):
                self._ckpt.maybe_save(self.global_step, self.params,
                                      self.opt_state, force=True)
        # final save is forced AND joined: train() returning guarantees a
        # durable checkpoint even if the caller never calls close()
        self._ckpt.maybe_save(self.global_step, self.params, self.opt_state,
                              force=True)
        self._ckpt.manager.wait_until_finished()
        if verbose and metrics:
            print(f"step {self.global_step}: "
                  f"loss={float(metrics['model_loss']):.6f}", flush=True)
        return {k: float(v) for k, v in metrics.items()} if metrics else {}

    def evaluate(self, input_fn: Callable[[], Iterator], steps: int = 1):
        """Mean loss over `steps` fresh batches (the reference's
        eval_metric_ops mean-loss, training_estimators.py:112)."""
        it = input_fn()
        losses = []
        for i in range(steps):
            batch = jnp.asarray(next(it))
            if self._latent:
                # eval keys live in a disjoint fold range from training's
                # global-step keys
                key = jax.random.fold_in(self._base_key, 2 ** 31 + i)
                _, metrics = self._loss_fn(self.params, batch, key)
            else:
                _, metrics = self._loss_fn(self.params, batch)
            losses.append(float(metrics["model_loss"]))
        return {"loss": float(np.mean(losses))}

    def close(self):
        self._ckpt.close()


def build_input_fn(ec: EstimatorConfig, cfg: CMPSConfig):
    """(reference: training_estimators.py:87-95 — shuffle/repeat/batch over
    the static dataset; synthetic fallback mirrors the test fixture)."""
    if not ec.data_dir:
        return lambda: damped_sine_iterator(cfg, ec.sample_duration,
                                            seed=ec.seed)
    data = read_audio_tfrecords(ec.data_dir,
                                sample_duration=ec.sample_duration)
    return lambda: iter(ArrayDataset(data, cfg.minibatch_size, seed=ec.seed))


def main(argv=None):
    ec = parse_args(sys.argv[1:] if argv is None else argv)
    cfg = CMPSConfig(minibatch_size=ec.batch_size, bond_dim=ec.bond_d,
                     delta_t=ec.dt, learning_rate=ec.learning_rate)
    mps_model = "rho_mps" if ec.discr else "psi_mps"
    est = Estimator(mps_model, cfg, ec.model_dir,
                    save_checkpoints_steps=ec.viz_steps, seed=ec.seed)
    input_fn = build_input_fn(ec, cfg)
    # chunked training loop (reference: training_estimators.py:114-115)
    for _ in range(ec.max_steps // ec.viz_steps):
        est.train(input_fn, steps=ec.viz_steps, verbose=True)
    est.close()


if __name__ == "__main__":
    main()
