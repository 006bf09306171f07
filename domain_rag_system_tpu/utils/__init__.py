from domain_rag_system_tpu.utils.logging import get_logger
from domain_rag_system_tpu.utils.timing import StageTimer, Timer

__all__ = ["get_logger", "Timer", "StageTimer"]

from domain_rag_system_tpu.utils.arrays import topk_desc  # noqa: E402

__all__.append("topk_desc")
