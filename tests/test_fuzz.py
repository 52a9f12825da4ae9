"""Bounded randomized differential smoke (SURVEY.md §4.2-1 driven wide).

A fixed-seed slice of scripts/fuzz_parity.py's generator runs in CI: each
trial draws a random (shape, density, rank, objective, bucket policy,
hot/dense blocks, shard count, exchange) config and checks the estimator
against the reference-faithful oracle — one-sweep factors, multi-sweep
trajectory, and exact serving with/without exclusion. The long-running
multi-seed sweeps live in scripts/fuzz_parity.py (140+ trials per model
per round); this bounded version pins the generator itself from rotting.
"""

import importlib.util
import os

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "fuzz_parity",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "fuzz_parity.py"))
fuzz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fuzz)


def test_fuzz_als_smoke(cpu_mesh):
    rng = np.random.default_rng(0)
    for t in range(8):
        fuzz.one_trial(rng, t)


def test_fuzz_imc_smoke(cpu_mesh):
    rng = np.random.default_rng(3)
    for t in range(6):
        fuzz.one_imc_trial(rng, t)


def test_fuzz_hybrid2d_smoke(cpu_mesh):
    rng = np.random.default_rng(5)
    for t in range(4):
        fuzz.one_hybrid2d_trial(rng, t)


def test_fuzz_parser_smoke():
    rng = np.random.default_rng(7)
    for t in range(25):
        fuzz.one_parser_trial(rng, t)
