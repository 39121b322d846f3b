from quatro_tpu.preprocessing.patchwork import (PatchworkResult, czm_bin,
                                                estimate_ground)
from quatro_tpu.preprocessing.projection import (ProjectionResult,
                                                 label_components,
                                                 project_to_range_image,
                                                 segment_cloud)

__all__ = [
    "PatchworkResult", "czm_bin", "estimate_ground", "ProjectionResult",
    "label_components", "project_to_range_image", "segment_cloud",
]
