from quatro_tpu.solver.quatro import (register_batch,
                                      register_correspondences,
                                      register_hypotheses)
from quatro_tpu.solver.scale import pairwise_distances, tim_consistency_graph
from quatro_tpu.solver.translation import solve_translation
from quatro_tpu.solver.rotation import gnc_rotation_2d, gnc_rotation_3d
from quatro_tpu.solver.ground import (align_ground, compose_leveled_solution,
                                      fit_ground_plane, frame_leveling,
                                      leveling_rotation)
from quatro_tpu.solver.verify import alignment_overlap, arbitrate_hypotheses

__all__ = [
    "register_correspondences", "register_batch", "register_hypotheses",
    "tim_consistency_graph", "pairwise_distances", "solve_translation",
    "gnc_rotation_2d", "gnc_rotation_3d", "align_ground",
    "compose_leveled_solution", "fit_ground_plane", "frame_leveling",
    "leveling_rotation", "alignment_overlap", "arbitrate_hypotheses",
]
