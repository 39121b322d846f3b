"""quatro-tpu: TPU-native global point-cloud registration + loop closing.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
url-kaist/Quatro (ICRA'22 "A Single Correspondence Is Enough"; quasi-SO(3)
degeneracy-robust TEASER++ variant): Patchwork ground segmentation,
range-image sub-clustering, voxel+FPFH feature matching, and the certifiable
GNC-TLS / COTE solver — batched over scan pairs and sharded over device
meshes instead of OpenMP threads.
"""

__version__ = "0.1.0"

from quatro_tpu.config import (DEFAULT_CONFIG, FPFHConfig,
                               GroundAlignmentConfig, IcpConfig,
                               LidarConfig, PatchworkConfig, PipelineConfig,
                               ProjectionConfig, SolverConfig, replace)
from quatro_tpu.registration import QuatroRegistration
from quatro_tpu.types import PointBatch, RegistrationSolution

__all__ = [
    "DEFAULT_CONFIG", "FPFHConfig", "GroundAlignmentConfig", "IcpConfig",
    "LidarConfig", "PatchworkConfig", "PipelineConfig", "ProjectionConfig",
    "QuatroRegistration", "SolverConfig", "PointBatch",
    "RegistrationSolution", "replace", "__version__",
]
