from .eigensolver import block_power_svd

__all__ = ["block_power_svd"]
