"""Standalone sampling CLI — the real implementation of the reference's
stub (reference: sample.py:18-19 defines flags but ``main`` is ``pass``; the
actual restore-and-sample flow only exists in the reference notebook,
cells 33-37).

    python -m audio_mps_tpu.sample --modeldir=<run logdir> \
        --mps_model=psi_mps --num_samples=3 --sample_duration=65536 \
        --temperature=1.0 --out=samples.npz

Restores the latest Orbax checkpoint written by train.py and generates
waveforms fully on-device. ``--mesh=dp[:N]`` shards the chains over a
device mesh (make_dp_sample); ``--fused`` selects the Pallas SDE
sampler kernels in either mode.
"""
from __future__ import annotations

import dataclasses
import os
import sys

import jax
import numpy as np

from .config import CMPSConfig, _coerce
from .models import core
from .training import Checkpointer, init_params_for, make_optimizer


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    modeldir: str = ""
    mps_model: str = ""       # "" = take from config.json (else psi_mps)
    hparams: str = ""
    sample_duration: int = 2 ** 16
    sample_rate: int = 16000
    num_samples: int = 3
    temperature: float = 1.0
    seed: int = 0
    out: str = "samples.npz"
    wav: bool = True
    visualize: bool = False      # waveform PNGs (reference sample.py:12)
    fused: bool = False          # Pallas fused SDE kernel (TPU)
    mesh: str = ""               # "dp[:N]": shard the chains over devices


_TYPES = {"modeldir": str, "mps_model": str, "hparams": str,
          "sample_duration": int, "sample_rate": int, "num_samples": int,
          "temperature": float, "seed": int, "out": str, "wav": bool,
          "visualize": bool, "fused": bool, "mesh": str}


def parse_args(argv) -> SampleConfig:
    sc = SampleConfig()
    updates = {}
    for arg in argv:
        if not arg.startswith("--"):
            continue
        body = arg[2:]
        k, v = (body.split("=", 1) if "=" in body else (body, "true"))
        if k not in _TYPES:
            raise ValueError(f"unknown flag --{k}")
        updates[k] = _coerce(v, _TYPES[k])
    return dataclasses.replace(sc, **updates)


def write_wav(path: str, waveform: np.ndarray, sample_rate: int):
    """Minimal 16-bit PCM WAV writer (stdlib only)."""
    import wave
    w = np.asarray(waveform, dtype=np.float64)
    peak = np.abs(w).max()
    if peak > 0:
        w = w / peak
    pcm = (w * 32767.0).astype("<i2")
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def sample(sc: SampleConfig, verbose: bool = True):
    if not sc.modeldir:
        raise ValueError("--modeldir is required (the run logdir written by "
                         "train.py)")
    mps_model = sc.mps_model
    cfg_path = os.path.join(sc.modeldir, "config.json")
    if os.path.exists(cfg_path):
        import json as _json
        saved = _json.load(open(cfg_path))
        # saved config is the base; --hparams overrides individual keys;
        # --mps_model only wins when explicitly given
        cfg = CMPSConfig(**saved["cfg"]).parse(sc.hparams)
        if not mps_model:
            mps_model = saved["run"].get("mps_model", "psi_mps")
    else:
        cfg = CMPSConfig().parse(sc.hparams)
    mps_model = mps_model or "psi_mps"
    key = jax.random.PRNGKey(sc.seed)
    key, ikey, skey = jax.random.split(key, 3)

    params = init_params_for(mps_model, ikey, cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    ckpt = Checkpointer(os.path.join(sc.modeldir, "checkpoints"))
    params, _, step = ckpt.restore(params, opt_state)
    if step == 0 and verbose:
        print("warning: no checkpoint found, sampling from random init",
              flush=True)

    if sc.mesh:
        # sharded ancestral sampling: chains split over a dp mesh (the
        # same shard_map path the dryrun and library expose); generation
        # is serial in time, so the mesh buys chain throughput
        from .config import parse_mesh_spec
        from .parallel import make_dp_sample, make_mesh, replicate
        kind, dims = parse_mesh_spec(sc.mesh)
        if kind != "dp":
            raise ValueError(
                f"--mesh={sc.mesh}: sampling shards CHAINS over devices "
                f"— only dp[:N] applies (generation is serial in time)")
        n = dims or len(jax.devices())
        if sc.num_samples % n:
            raise ValueError(
                f"num_samples={sc.num_samples} must be divisible by the "
                f"{n}-device mesh size (--mesh={sc.mesh})")
        mesh = make_mesh(n)
        # the restored checkpoint sits on device 0 — re-place onto the
        # mesh (the train CLI's restore path does the same)
        params = replicate(params, mesh)
        build = make_dp_sample(mps_model, cfg, mesh, fused=bool(sc.fused))
        waves = np.asarray(build(sc.num_samples, sc.sample_duration,
                                 sc.temperature)(params, skey))
    else:
        if mps_model == "latent":
            from .models.latent import sample_latent
            if sc.fused:
                import functools
                fn = functools.partial(sample_latent, fused=True)
            else:
                fn = sample_latent
        elif sc.fused:
            from .ops.pallas_scan import (psi_sample_pallas_keyed,
                                          rho_sample_pallas_keyed)
            fn = (rho_sample_pallas_keyed if mps_model == "rho_mps"
                  else psi_sample_pallas_keyed)
        else:
            fn = (core.sample_rho if mps_model == "rho_mps"
                  else core.sample_psi)
        waves = np.asarray(fn(params, cfg, skey, sc.num_samples,
                              sc.sample_duration, sc.temperature))
    if sc.out:
        np.savez(sc.out, samples=waves, step=step)
        if verbose:
            print(f"wrote {sc.out}: {waves.shape} (checkpoint step {step})",
                  flush=True)
    if sc.wav:
        base = os.path.splitext(sc.out or "samples.npz")[0]
        for i, w in enumerate(waves):
            write_wav(f"{base}_{i}.wav", w, sc.sample_rate)
        if verbose:
            print(f"wrote {len(waves)} wav files at {base}_*.wav", flush=True)
    if sc.visualize:
        from .summaries import waveform_figure
        base = os.path.splitext(sc.out or "samples.npz")[0]
        for i, w in enumerate(waves):
            fig = waveform_figure(w, cfg.delta_t)
            fig.savefig(f"{base}_{i}.png", dpi=100)
        if verbose:
            print(f"wrote {len(waves)} waveform plots at {base}_*.png",
                  flush=True)
    return waves


def main(argv=None):
    sample(parse_args(sys.argv[1:] if argv is None else argv))


if __name__ == "__main__":
    main()
