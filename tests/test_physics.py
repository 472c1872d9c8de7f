"""Learned-physics validation (VERDICT r2 item 2): training on damped_sine
must actually teach the model middle C — the learned Hamiltonian's dominant
emission line and the spectral peak of generated audio both lock onto
261.6 Hz (reference fixture: data.py:12-14; the histogram/waveform
summaries the reference eyeballs: train.py:75-85).

The full-scale run (reference defaults: D=8, B=8, T=2^16, 1200 steps) runs
on TPU via ``python tools/physics_check.py`` and is recorded in
BASELINE.md + PHYSICS.json. This in-suite version is scaled down and
marked slow — enable with RUN_SLOW_PHYSICS=1 (~ minutes on CPU).
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.smoke
def test_spectral_peak_detector():
    """The FFT-peak helper finds a known tone exactly."""
    from physics_check import spectral_peak_hz
    dt = 1.0 / 16000
    t = np.arange(8192) * dt
    w = np.sin(2 * np.pi * 440.0 * t)[None, :] * np.exp(-t / 0.1)
    peak = spectral_peak_hz(w, dt)
    assert abs(peak - 440.0) < 3.0, peak


def test_learned_line_hz_on_known_params():
    """A hand-built qubit with freqs (+w/2, -w/2) and R coupling 0<->1
    has its one significant emission line at w / 2pi; weak couplings are
    excluded by the weight floor."""
    import jax
    from audio_mps_tpu.config import CMPSConfig
    from audio_mps_tpu.models.params import init_psi
    from physics_check import learned_line_hz
    w = 2 * np.pi * 261.6
    cfg = CMPSConfig(bond_dim=3)
    R = np.zeros((3, 3), dtype=np.complex64)
    R[0, 1] = 1.0
    R[0, 2] = 0.01          # insignificant line at a wrong frequency
    params = init_psi(jax.random.PRNGKey(0), cfg,
                      freqs_in=np.array([w / 2, -w / 2, w * 3],
                                        np.float32),
                      R_in=R)
    assert abs(learned_line_hz(params) - 261.6) < 1e-3


@pytest.mark.skipif(not os.environ.get("RUN_SLOW_PHYSICS"),
                    reason="slow physics run; set RUN_SLOW_PHYSICS=1 on a "
                           "TPU host (~4 min; results recorded in "
                           "PHYSICS.json / BASELINE.md)")
def test_training_learns_middle_c():
    """The validated full-scale recipe (D=8, T=2^16, 3000 steps at
    reference defaults): smaller configs were measured NOT to lock onto
    middle C (D=4/T=8192 converges to a 427.8 Hz attractor), so the
    opt-in test runs the real thing — intended for a TPU host, where it
    takes ~4 minutes with the fused kernels."""
    from physics_check import run
    result, _ = run(steps=int(os.environ.get("PHYSICS_STEPS", 3000)),
                    verbose=False)
    assert result["freqs_pass"], result
    assert result["spectrum_pass"], result
