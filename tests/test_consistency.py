"""Capstone consistency certificate: every NLL implementation in the
framework — across model families, frames, factorizations, kernels, and
parallelism strategies — agrees on one fixture."""
import dataclasses

import jax
import numpy as np
import pytest

from audio_mps_tpu.config import CMPSConfig
from audio_mps_tpu.data import damped_sine_batch
from audio_mps_tpu.models import core, reference_transcription
from audio_mps_tpu.models.params import init_psi, init_rho
from audio_mps_tpu.ops.pallas_grad import (psi_nll_pallas_trainable,
                                           rho_nll_pallas_trainable)
from audio_mps_tpu.ops.pallas_scan import psi_nll_pallas, rho_nll_pallas
from audio_mps_tpu.parallel.time_pipeline import (make_time_mesh,
                                                  psi_nll_pipelined,
                                                  rho_nll_pipelined)
from audio_mps_tpu.parallel.time_pscan import (psi_nll_time_sharded,
                                               rho_nll_time_sharded)

CFG = CMPSConfig(minibatch_size=4, bond_dim=6, scan_chunk=0)
T = 8 * 24 + 1   # T-1 divisible by the 8-stage mesh


@pytest.fixture(scope="module")
def fixture():
    data = damped_sine_batch(jax.random.PRNGKey(2), 4, T, CFG.delta_t)
    mesh = make_time_mesh(8)
    return data, mesh


def test_rho_nll_all_implementations_agree(fixture):
    data, mesh = fixture
    params = init_rho(jax.random.PRNGKey(1), CFG)
    impls = {
        "reference_transcription":
            lambda: reference_transcription.rho_nll_lab_frame(params, CFG,
                                                              data),
        "rotating_frame_matrix": lambda: core.rho_nll(params, CFG, data),
        "purification_factor":
            lambda: core.rho_nll_factor(params, CFG, data),
        "pallas_fused_fwd":
            lambda: rho_nll_pallas(params, CFG, data, interpret=True),
        "pallas_fused_fwd_defer_norm":
            lambda: rho_nll_pallas(params, CFG, data, interpret=True,
                                   defer_norm=True),
        "pallas_custom_vjp":
            lambda: rho_nll_pallas_trainable(params, CFG, data,
                                             interpret=True),
        "parallel_in_time":
            lambda: core.rho_nll_pscan(params, CFG, data, time_chunk=48),
        "temporal_pipeline":
            lambda: rho_nll_pipelined(params, CFG, data, mesh,
                                      num_microbatches=4),
        "time_sharded":
            lambda: jax.jit(lambda: rho_nll_time_sharded(params, CFG, data,
                                                         mesh))(),
        "chunked_remat":
            lambda: core.rho_nll_factor(
                params, dataclasses.replace(CFG, scan_chunk=32), data),
    }
    values = {name: float(fn()) for name, fn in impls.items()}
    anchor = values["reference_transcription"]
    for name, v in values.items():
        np.testing.assert_allclose(
            v, anchor, rtol=3e-4,
            err_msg=f"{name}={v} disagrees with transcription={anchor}: "
                    f"{values}")


def test_psi_nll_all_implementations_agree(fixture):
    data, mesh = fixture
    params = init_psi(jax.random.PRNGKey(1), CFG)
    impls = {
        "reference_transcription":
            lambda: reference_transcription.psi_nll_lab_frame(params, CFG,
                                                              data),
        "rotating_frame": lambda: core.psi_nll(params, CFG, data),
        "pallas_fused_fwd":
            lambda: psi_nll_pallas(params, CFG, data, interpret=True),
        "pallas_custom_vjp":
            lambda: psi_nll_pallas_trainable(params, CFG, data,
                                             interpret=True),
        "rank1_parallel_in_time":
            lambda: core.psi_nll_pscan(params, CFG, data, time_chunk=48),
        "temporal_pipeline":
            lambda: psi_nll_pipelined(params, CFG, data, mesh,
                                      num_microbatches=4),
        "rank1_time_sharded":
            lambda: jax.jit(lambda: psi_nll_time_sharded(params, CFG, data,
                                                         mesh))(),
    }
    values = {name: float(fn()) for name, fn in impls.items()}
    anchor = values["reference_transcription"]
    for name, v in values.items():
        np.testing.assert_allclose(
            v, anchor, rtol=3e-4,
            err_msg=f"{name}={v} disagrees with transcription={anchor}: "
                    f"{values}")
