from domain_rag_system_tpu.utils.logging import get_logger
from domain_rag_system_tpu.utils.timing import StageTimer, Timer

__all__ = ["get_logger", "Timer", "StageTimer"]
