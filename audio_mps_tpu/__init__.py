"""audio-mps-tpu: a TPU-native (JAX/XLA/Pallas) continuous-MPS audio
framework with the capabilities of AustenLamacraft/audio-mps.

Public surface:
  - CMPSConfig / RunConfig        (config — reference HParams + flags)
  - PsiCMPS / RhoCMPS             (models.cmps — reference model.py classes)
  - models.core                   (functional losses/samplers/trajectories,
                                   incl. factor-form and parallel-in-time)
  - models.latent                 (latent-conditioned variant)
  - models.reference_transcription (the lab-frame parity anchor)
  - ops.pallas_scan / ops.pallas_grad (fused TPU kernels: NLL fwd, SDE
                                   samplers, custom-VJP training)
  - parallel                      (data-parallel mesh + temporal pipeline)
  - data / get_audio              (damped-sine, TFRecord engine, NSynth)
  - training / estimator / train / sample (loops + CLIs)
"""

from .config import CMPSConfig, RunConfig
from .models import core
from .models.cmps import CMPS, PsiCMPS, RhoCMPS
from .models.params import init_psi, init_rho

__version__ = "0.1.0"

__all__ = [
    "CMPSConfig", "RunConfig", "CMPS", "PsiCMPS", "RhoCMPS", "core",
    "init_psi", "init_rho",
]
