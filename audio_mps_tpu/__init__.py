"""audio-mps-tpu: a TPU-native (JAX/XLA/Pallas) continuous-MPS audio
framework with the capabilities of AustenLamacraft/audio-mps.

Public surface:
  - CMPSConfig / RunConfig    (config.py — reference HParams + flags)
  - PsiCMPS / RhoCMPS         (models.cmps — reference model.py classes)
  - functional core           (models.core — losses, samplers, trajectories)
  - get_audio                 (data — reference data.py entry point)
"""

from .config import CMPSConfig, RunConfig
from .models.cmps import CMPS, PsiCMPS, RhoCMPS
from .models import core
from .models.params import init_psi, init_rho

__version__ = "0.1.0"

__all__ = [
    "CMPSConfig", "RunConfig", "CMPS", "PsiCMPS", "RhoCMPS", "core",
    "init_psi", "init_rho",
]
