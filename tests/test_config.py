"""Config invariants — most importantly, the SHIPPING preset pin.

CLAUDE.md: the round-5 headline artifacts (EVAL_r05.json 0.990 at n=300,
BENCH_SELF_r05.json 73.7 pairs/s) were both measured at ONE exact
PipelineConfig. ``PipelineConfig.recommended()`` is that config made
first-class; this test pins every knob the artifacts depend on so a
default drift cannot silently detach the preset from the published
numbers (the 0.99 has zero slack — 3 failures = the bar).
"""

import dataclasses

import pytest

from quatro_tpu.config import FPFHConfig, PipelineConfig, SolverConfig


def test_recommended_is_shipping():
    cfg = PipelineConfig.recommended()
    # Solver hypothesis machinery — the only deliberate delta vs defaults.
    assert cfg.solver.num_hypotheses == 4
    assert cfg.solver.num_vote_hypotheses == 2
    assert cfg.solver.total_hypotheses == 6
    # The FPFH knobs the accuracy artifact leans on are the DEFAULTS
    # (the tuple-test starvation floor and crosscheck fallback gate).
    assert cfg.fpfh.tuple_min_keep == 48
    assert cfg.fpfh.crosscheck_min_matches == 64
    # Everything else must equal the bare defaults — bench.py builds its
    # config from the defaults + the two solver knobs, so any other
    # divergence would mean recommended() is not what bench.py measures.
    base = PipelineConfig()
    assert dataclasses.replace(
        cfg, solver=dataclasses.replace(
            cfg.solver, num_hypotheses=1, num_vote_hypotheses=0)) == base
    # Serving capacities of the measured artifacts.
    assert cfg.max_raw_points == 131072
    assert cfg.max_nonground_points == 65536
    assert cfg.max_segment_points == 32768
    assert cfg.max_voxels == 8192
    assert cfg.stack_preprocess is False   # measured regression when True


def test_recommended_accepts_overrides():
    cfg = PipelineConfig.recommended(voxel_size=0.5)
    assert cfg.voxel_size == 0.5
    assert cfg.solver.num_hypotheses == 4
    custom = PipelineConfig.recommended(solver=SolverConfig())
    assert custom.solver.num_hypotheses == 1


def test_solver_config_validation():
    with pytest.raises(ValueError):
        SolverConfig(num_hypotheses=0)
    with pytest.raises(ValueError):
        SolverConfig(num_vote_hypotheses=-1)
    with pytest.raises(ValueError):
        SolverConfig(noise_bound=0.0)


def test_fpfh_defaults_are_reference_radii():
    # The reference's HDL-64E tuning (config/params.yaml): 0.5/0.75 m.
    f = FPFHConfig()
    assert f.normal_radius == pytest.approx(0.5)
    assert f.fpfh_radius == pytest.approx(0.75)
