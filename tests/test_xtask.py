"""Declarative workload runner (reference: crates/xtask/src/test/,
TESTING.md): the checked-in workload JSONs must pass end-to-end,
including the cross-version restart chain."""

import glob
import os

import pytest

from meilisearch_tpu.xtask import run_workload

WORKLOADS = sorted(
    glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "workloads", "tests", "*.json")
    )
)


def test_workloads_exist():
    assert len(WORKLOADS) >= 3


@pytest.mark.parametrize("path", WORKLOADS, ids=[os.path.basename(p) for p in WORKLOADS])
def test_workload(path):
    run_workload(path, verbose=False)
