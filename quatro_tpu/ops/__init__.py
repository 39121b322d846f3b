from quatro_tpu.ops.voxel import voxel_downsample
from quatro_tpu.ops.neighbors import NeighborLists, radius_neighbors
from quatro_tpu.ops.normals import Normals, estimate_normals
from quatro_tpu.ops.fpfh import compute_fpfh, compute_spfh, pair_features
from quatro_tpu.ops.matching import Correspondences, match_features
from quatro_tpu.ops.scancontext import (detect_loop_candidates, ring_key,
                                        sc_distance, scan_context)

__all__ = [
    "voxel_downsample", "NeighborLists", "radius_neighbors", "Normals",
    "estimate_normals", "compute_fpfh", "compute_spfh", "pair_features",
    "Correspondences", "match_features", "scan_context", "ring_key",
    "sc_distance", "detect_loop_candidates",
]
