"""Pipelines (§3 of SURVEY.md) + lineage metrics + checkpoint/resume."""

from .lineage import Lineage  # noqa: F401
from .pipelines import (  # noqa: F401
    apply_corrections,
    build_exutoire,
    run_reference_network,
    run_width_network,
    width_segments_tail,
)
from .checkpoint import CheckpointedPipeline  # noqa: F401
from .curation import run_curation_pipeline  # noqa: F401
