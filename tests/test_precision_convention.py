"""Source-level guard for the TPU precision rule (docs/architecture.md).

On TPU, f32 matmuls default to bf16 MXU passes; a bare ``points @ rot.T``
pose application carries tens of centimeters of error at lidar range.
CPU tests cannot catch such regressions numerically, so this test greps
the package: device-side pose applications must go through
``utils.se3.rotate_points`` (or pass precision explicitly), and
geometry-scale einsums must pass ``precision=``.
"""

import os
import re

import quatro_tpu

PKG = os.path.dirname(quatro_tpu.__file__)

# files whose matmuls operate on metre-scale geometry
GEOMETRY_FILES = [
    "solver/icp.py", "solver/verify.py", "solver/rotation.py",
    "solver/quatro.py", "solver/ground.py", "solver/translation.py",
    "preprocessing/patchwork.py", "ops/normals.py", "ops/fpfh.py",
    "pipeline.py",
]

BARE_POSE_APPLY = re.compile(
    r"@ (rot(ation)?(2d\(\w+\))?|prior_\w+|r)\.T\b")
BARE_EINSUM = re.compile(r"jnp\.einsum\((?:[^()]|\([^()]*\))*\)")


def test_no_bare_pose_applications():
    offenders = []
    for rel in GEOMETRY_FILES:
        src = open(os.path.join(PKG, rel)).read()
        for m in BARE_POSE_APPLY.finditer(src):
            line = src[:m.start()].count("\n") + 1
            offenders.append(f"{rel}:{line}: {m.group(0)!r}")
    assert not offenders, (
        "bare pose-application matmuls (use utils.se3.rotate_points or "
        "precision=HIGHEST):\n" + "\n".join(offenders))


def test_geometry_einsums_pin_precision():
    offenders = []
    for rel in GEOMETRY_FILES:
        src = open(os.path.join(PKG, rel)).read()
        for m in BARE_EINSUM.finditer(src):
            if "precision=" not in m.group(0):
                line = src[:m.start()].count("\n") + 1
                offenders.append(f"{rel}:{line}")
    assert not offenders, (
        "geometry-scale einsums without an explicit precision=:\n"
        + "\n".join(offenders))
