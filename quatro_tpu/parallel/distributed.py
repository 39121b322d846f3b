"""Multi-host initialization and mesh construction.

The reference is single-process (SURVEY.md §5: no distributed backend at
all); this is green-field TPU design. Topology: every host runs the same
program, `jax.distributed.initialize` wires the hosts, and the global
('pairs',) mesh spans all chips in the slice — ICI carries the pose-graph
psum within a slice, DCN across slices. The per-pair pipeline itself needs
no communication, so scaling efficiency is set purely by the collective in
the pose-graph stage and by input skew.

Single-chip CI cannot exercise real multi-host; the process-count logic is
covered by the virtual-device mesh tests plus the driver's
dryrun_multichip (which compiles the identical shardings).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from quatro_tpu.parallel.mesh import PAIRS_AXIS


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Wire up jax.distributed across hosts.

    With no arguments, relies on the TPU environment's auto-detection
    (GKE/Cloud TPU metadata); arguments override for manual launches, e.g.

        initialize_multihost("10.0.0.1:8476", num_processes=2,
                             process_id=int(os.environ["HOST_ID"]))
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def global_pairs_mesh() -> Mesh:
    """1-D ('pairs',) mesh over every chip in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (PAIRS_AXIS,))


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a pair batch this host should feed into a
    jax.make_array_from_process_local_data-style construction.

    global_batch must divide evenly across hosts — a silent remainder
    would drop pairs from the job (pad the batch and mask the padding
    instead, as sharded_register_batch's docstring requires)."""
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global_batch={global_batch} is not divisible by "
            f"process_count={n_proc}; the remainder pairs would silently "
            "be assigned to no host. Pad the batch (mask=False rows).")
    per = global_batch // n_proc
    lo = jax.process_index() * per
    return slice(lo, lo + per)
