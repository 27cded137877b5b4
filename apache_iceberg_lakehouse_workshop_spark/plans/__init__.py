"""Plan-level engine services: snapshot-versioned storage (lakeshim),
acceleration/reflections (accelerator). SURVEY §2.1 S14/S17, §4 R7/R9/R10."""

from .accelerator import AcceleratorRegistry  # noqa: F401
from .lakeshim import Lakehouse, LakeTable  # noqa: F401
from .pipeline import MedallionPipeline, StepResult  # noqa: F401
