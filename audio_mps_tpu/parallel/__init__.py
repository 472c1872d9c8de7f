from .combined import (make_2d_mesh, make_3d_mesh,
                       make_dp_rank_time_train_step,
                       make_dp_time_train_step, shard_batch_2d)
from .data_parallel import (make_dp_sample, make_dp_train_step, replicate,
                            shard_batch)
from .mesh import DATA_AXIS, ensure_devices, make_mesh
from .rank_parallel import (MODEL_AXIS, make_2d_rank_mesh,
                            make_dp_rank_train_step, make_model_mesh,
                            make_rank_train_step, rho_nll_rank_sharded,
                            rho_nll_rank_sharded_fused)
from .time_pipeline import (TIME_AXIS, make_time_mesh, make_time_train_step,
                            psi_nll_pipelined, psi_nll_pipelined_fused,
                            rho_nll_pipelined, rho_nll_pipelined_fused,
                            rho_nll_rank_pipelined)

__all__ = ["make_2d_mesh", "make_3d_mesh", "make_dp_rank_time_train_step",
           "make_dp_time_train_step", "shard_batch_2d",
           "make_dp_sample", "make_dp_train_step", "replicate",
           "shard_batch", "DATA_AXIS", "ensure_devices", "make_mesh",
           "MODEL_AXIS", "make_model_mesh", "rho_nll_rank_sharded",
           "rho_nll_rank_sharded_fused", "make_rank_train_step",
           "make_2d_rank_mesh", "make_dp_rank_train_step",
           "TIME_AXIS", "make_time_mesh", "make_time_train_step",
           "psi_nll_pipelined", "psi_nll_pipelined_fused",
           "rho_nll_pipelined", "rho_nll_pipelined_fused",
           "rho_nll_rank_pipelined"]
