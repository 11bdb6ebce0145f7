"""Logging/observability.

The reference's only observability is console.log diagnostics: point budget
and AABB at init (src/PointManager.ts:53-61), pipeline-rebuild notices
(src/GradientSampler.ts:111,120-122), binning sanity warnings
(src/GPUTileBinner.ts:268-280).  We route the equivalents through a standard
logger so hosts can configure them.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("splat_renderer_tpu")


def log_rebuild(structure_hash: str) -> None:
    """Frame-program (re)compile notice — the analogue of the reference's
    'Rebuilding gradient pipeline' console message."""
    logger.info("compiling frame program for scene structure %s", structure_hash)


def log_point_budget(n: int, num_primitives: int) -> None:
    logger.info("point budget: %d points for %d primitive(s)", n, num_primitives)
