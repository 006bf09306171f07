from domain_rag_system_tpu.generation.extractive import ExtractiveGenerator
from domain_rag_system_tpu.generation.generator import (
    AnswerGenerator,
    BaseGenerator,
    TemplateGenerator,
)

__all__ = ["BaseGenerator", "AnswerGenerator", "TemplateGenerator",
           "ExtractiveGenerator"]
