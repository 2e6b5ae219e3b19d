"""Multi-chip scaling: device meshes, sharded MC studies, distributed fitting."""
from .mesh import (make_mesh, make_multihost_mesh, shard_mc, shard_mc_local,
                   filter_mc_sharded, filter_bank_sharded, mc_metrics_sharded)
from .fit import nlml_loss, make_fit_step, fit_kernel_params
from .timescan import parallel_linear_filter, parallel_linear_smoother
from .sqrttime import (parallel_affine_sqrt_filter, parallel_affine_sqrt_smoother,
                       parallel_linear_sqrt_filter, parallel_linear_sqrt_smoother)
from .iplf import (slr_affine, parallel_affine_filter, parallel_affine_smoother,
                   IteratedSmootherResult, iterated_parallel_smoother)
from .shardtime import (sharded_associative_scan,
                        sharded_parallel_affine_filter,
                        sharded_parallel_affine_smoother,
                        sharded_parallel_affine_sqrt_filter,
                        sharded_parallel_affine_sqrt_smoother)

__all__ = [
    "make_mesh", "make_multihost_mesh", "shard_mc", "shard_mc_local",
    "filter_mc_sharded", "filter_bank_sharded", "mc_metrics_sharded",
    "nlml_loss", "make_fit_step", "fit_kernel_params",
    "parallel_linear_filter", "parallel_linear_smoother",
    "parallel_affine_sqrt_filter", "parallel_affine_sqrt_smoother",
    "parallel_linear_sqrt_filter", "parallel_linear_sqrt_smoother",
    "slr_affine", "parallel_affine_filter", "parallel_affine_smoother",
    "IteratedSmootherResult", "iterated_parallel_smoother",
    "sharded_associative_scan",
    "sharded_parallel_affine_filter", "sharded_parallel_affine_smoother",
    "sharded_parallel_affine_sqrt_filter",
    "sharded_parallel_affine_sqrt_smoother",
]
