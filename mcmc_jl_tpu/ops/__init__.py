"""Device-side numeric ops: FFT autocovariance, safe linear algebra, and
Pallas kernels for the hot paths."""
from .acf import autocov

__all__ = ["autocov"]

from .pallas_glm import glm_hmc_leapfrogs, pad_design, pad_chains
from .glm_hmc import run_glm_hmc, run_glm_hmc_sharded
from .pallas_target import (coordwise_logp, fused_target_leapfrogs,
                            lifted_model_block, run_target_hmc,
                            run_target_hmc_sharded)
from .pallas_rwm import run_target_rwm

__all__ += ["glm_hmc_leapfrogs", "pad_design", "pad_chains",
            "run_glm_hmc", "run_glm_hmc_sharded", "run_target_hmc_sharded",
            "coordwise_logp", "fused_target_leapfrogs", "run_target_hmc",
            "run_target_rwm", "lifted_model_block"]
