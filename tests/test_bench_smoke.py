"""Compile-and-run smoke test of the EXACT bench.py entry paths.

Round 2 shipped a bench default (fov flagship, m_d=84) that had never been
executed and crashed at compile time on hardware (BENCH_r02.json rc=1,
VMEM OOM in an in-loop cho_solve). This test compiles and runs every bench
mode at tiny batch on the CPU mesh so that class of regression can never
ship silently again — if bench.build() stops compiling, CI goes red.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _run(mode, batch=8, accuracy=""):
    control_batch, impc_iter = bench.build(mode, batch, accuracy)
    coeffs, success = control_batch()
    coeffs = np.asarray(coeffs)
    assert coeffs.shape[0] == batch
    assert np.all(np.isfinite(coeffs))
    assert impc_iter >= 1
    return np.asarray(success)


def test_bench_fov_path_compiles_and_runs():
    success = _run("fov")
    # well-separated random neighbors at r in [1, 3.5]: the QPs are
    # feasible. The raw f32 ADMM (200-iter entry + 64-iter warm tail) is
    # the THROUGHPUT-mode solver and leaves slack-saturated lanes
    # unusable: measured 47/64 = 0.73 usable on the B=64 ensemble
    # (tests/test_warm_start.py), 6/8 on this slice; the certified path
    # (IPM/polish) owns the 100% bar, and bench.py reports the measured
    # success_rate next to its solves/s.
    assert success.mean() >= 0.75


def test_bench_connectivity_path_compiles_and_runs():
    success = _run("connectivity")
    assert success.mean() > 0.9


def test_bench_fov_polish_path_compiles_and_runs():
    # conftest enables x64 globally, matching bench.py's polish config.
    # Same measured rate as the raw fov path (6/8 on this slice — the
    # polish can only certify lanes whose ADMM entry found the right
    # active set); the IPM owns the 100% bar.
    success = _run("fov", accuracy="polish")
    assert success.mean() >= 0.75


def test_bench_fov_ipm_path_compiles_and_runs():
    # the certified fov path: EVERY feasible lane must be usable
    success = _run("fov", accuracy="ipm")
    assert success.mean() == 1.0


def test_bench_connectivity_ipm_path_compiles_and_runs():
    success = _run("connectivity", accuracy="ipm")
    assert success.mean() == 1.0
