from .eigensolver import block_power_svd
from .topic_model import topic_model, topic_model_with_basis

__all__ = ["block_power_svd", "topic_model", "topic_model_with_basis"]
