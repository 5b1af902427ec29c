from .mesh import gemm_sharded, make_mesh, sharded_accum_step, sharding_for

__all__ = ["gemm_sharded", "make_mesh", "sharded_accum_step",
           "sharding_for"]
