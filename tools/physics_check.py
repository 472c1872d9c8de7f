"""Learned-physics validation: does training on damped_sine actually teach
the model middle C?

The reference's only quality signals are eyeballed TensorBoard artifacts —
the learned-frequencies histogram (reference: train.py:75) and waveform
plots of fresh samples (reference: train.py:77-85) — for data that is a
damped 261.6 Hz sine (reference: data.py:12-14). This tool turns those
into assertions (VERDICT r2 item 2):

  1. train at (scaled) reference defaults on damped_sine;
  2. FREQS CHECK: among the learned Hamiltonian's significant emission
     lines (|f_i - f_j|/2pi weighted by the R couplings — the physical
     content behind the freqs histogram the reference plots), one sits
     within 1 Hz of 261.6 (untrained-coincidence rate ~3%) — the rotating frame must pick up the data's
     oscillation frequency (measured: 0.02 Hz off after 3000 steps);
  3. SPECTRUM CHECK: low-temperature samples from the trained model have
     their FFT peak near 261.6 Hz.

Usage:  python tools/physics_check.py [--steps=1200] [--T=65536]
        [--bond_dim=8] [--batch=8] [--tol_hz=15] [--out=PHYSICS.json]

Full-scale run (TPU v5e, reference defaults, fused kernels): see the
BASELINE.md "learned physics" row for the recorded result.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

MIDDLE_C_HZ = 261.6          # reference: data.py:12-14


def learned_line_hz(params, target_hz: float = MIDDLE_C_HZ,
                    weight_floor: float = 0.1):
    """The learned Hamiltonian's emission line closest to `target_hz`
    among SIGNIFICANT transitions.

    The emission operator R couples ancilla levels i->j; a transition
    (i, j) radiates at |f_i - f_j| (rad/s). Only transitions carrying at
    least `weight_floor` of the maximum |R_ij|^2 coupling count as lines
    (raw R^2 does not rank emission amplitude — that also depends on the
    ancilla coherences, which is why the SPECTRUM check samples the
    model — but it does separate real lines from noise). Measured at
    reference defaults after 3000 steps the nearest significant line
    sits at 261.62 Hz — 0.02 Hz off middle C."""
    from audio_mps_tpu.models.cell import effective_R
    f = np.asarray(params.freqs)
    Rr, Ri = effective_R(params)
    w = np.asarray(Rr) ** 2 + np.asarray(Ri) ** 2
    w = w + w.T
    df = np.abs(f[:, None] - f[None, :]) / (2 * np.pi)
    iu = np.triu_indices(len(f), 1)
    weights, lines = w[iu], df[iu]
    keep = weights >= weight_floor * weights.max()
    lines = lines[keep]
    return float(lines[np.argmin(np.abs(lines - target_hz))])


def spectral_peak_hz(waves, delta_t):
    """FFT-peak frequency (Hz) of [N, T] waveforms — the MEDIAN over
    examples (robust to one bad chain) — ignoring DC and the slow
    damped-envelope bins (< 30 Hz)."""
    w = np.asarray(waves, dtype=np.float64)
    w = w - w.mean(axis=1, keepdims=True)
    spec = np.abs(np.fft.rfft(w, axis=1)) ** 2
    freqs = np.fft.rfftfreq(w.shape[1], d=delta_t)
    lo = np.searchsorted(freqs, 30.0)
    peaks = freqs[lo + np.argmax(spec[:, lo:], axis=1)]
    return float(np.median(peaks))


def run(steps=1200, T=2 ** 16, bond_dim=8, batch=8, tol_hz=15.0,
        seed=0, lr=1e-3, sample_temp=1e-6, fused=None, verbose=True,
        precision="highest"):
    from audio_mps_tpu.config import CMPSConfig
    from audio_mps_tpu.data import damped_sine_batch
    from audio_mps_tpu.models import core
    from audio_mps_tpu.training import init_params_for, make_train_step

    cfg = CMPSConfig(bond_dim=bond_dim, minibatch_size=batch,
                     learning_rate=lr, scan_chunk=256,
                     kernel_precision=precision)
    key = jax.random.PRNGKey(seed)
    key, ik = jax.random.split(key)
    params = init_params_for("psi_mps", ik, cfg)
    opt, step = make_train_step("psi_mps", cfg, fused=fused)
    opt_state = opt.init(params)

    losses = []
    t0 = time.time()
    for i in range(steps):
        key, dk = jax.random.split(key)
        batch_x = damped_sine_batch(dk, batch, T, cfg.delta_t)
        params, opt_state, metrics = step(params, opt_state, batch_x)
        if i % 100 == 0 or i == steps - 1:
            losses.append((i, float(metrics["total_loss"])))
            if verbose:
                print(f"step {i}: total={losses[-1][1]:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)

    learned_hz = learned_line_hz(params)

    key, sk = jax.random.split(key)
    sample_T = min(T, 2 ** 14)
    waves = core.sample_psi(params, cfg, sk, 4, sample_T, temp=sample_temp)
    peak_hz = spectral_peak_hz(waves, cfg.delta_t)

    result = {
        "config": {"steps": steps, "T": T, "bond_dim": bond_dim,
                   "batch": batch, "lr": lr, "seed": seed,
                   "precision": precision,
                   "device": str(jax.devices()[0])},
        "loss_curve": losses,
        "target_hz": MIDDLE_C_HZ,
        "learned_line_hz": learned_hz,
        "sample_spectral_peak_hz": peak_hz,
        "tol_hz": tol_hz,
        "line_tol_hz": 1.0,
        "freqs_pass": abs(learned_hz - MIDDLE_C_HZ) <= 1.0,
        "spectrum_pass": abs(peak_hz - MIDDLE_C_HZ) <= tol_hz,
        "wall_s": round(time.time() - t0, 1),
    }
    result["pass"] = result["freqs_pass"] and result["spectrum_pass"]
    return result, params


def main(argv):
    kw = {}
    out = "PHYSICS.json"
    casts = {"steps": int, "T": int, "bond_dim": int, "batch": int,
             "tol_hz": float, "seed": int, "lr": float,
             "sample_temp": float, "precision": str}
    for a in argv:
        if not a.startswith("--"):
            continue
        k, v = a[2:].split("=", 1)
        if k == "out":
            out = v
        elif k in casts:
            kw[k] = casts[k](v)
        else:
            raise ValueError(f"unknown flag --{k}")
    result, _ = run(**kw)
    print(json.dumps(result, indent=1))
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}: pass={result['pass']}")
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
