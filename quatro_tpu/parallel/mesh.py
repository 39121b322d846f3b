"""Device-mesh helpers for scan-pair data parallelism.

The reference's only parallelism is shared-memory OpenMP inside one process
(SURVEY.md §2); there is no distributed axis at all. The TPU-native scaling
axis is *scan pairs*: every stage of the pipeline is pure and per-pair, so a
1-D ('pairs',) mesh shards whole registrations across chips with zero
communication, and only the pose-graph reduction needs collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PAIRS_AXIS = "pairs"


def make_pairs_mesh(n_devices: int | None = None,
                    devices=None) -> Mesh:
    """1-D mesh over the 'pairs' axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (PAIRS_AXIS,))


def pairs_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding for pair-stacked pytrees."""
    return NamedSharding(mesh, P(PAIRS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
