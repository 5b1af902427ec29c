from .eigensolver import block_lanczos_svd, block_power_svd
from .topic_model import lift_topics, topic_model, topic_model_with_basis
from .xml_rank import xml_rank, xml_rank_in_mem

__all__ = ["block_lanczos_svd", "block_power_svd", "lift_topics",
           "topic_model", "topic_model_with_basis", "xml_rank",
           "xml_rank_in_mem"]
