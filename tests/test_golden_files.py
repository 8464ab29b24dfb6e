"""Committed golden vectors: pin the bitstream format forever.

These blobs were produced by the reference C implementation and are checked
into the repo, so format compatibility is enforced even where the reference
sources aren't mounted (unlike tests/test_golden.py, which builds the
oracle from the reference at test time).
"""

import json
from pathlib import Path

import numpy as np
import pytest

import deltarice_tpu as drt
from deltarice_tpu.config import RiceConfig

DATA = Path(__file__).parent / "data" / "golden"
CASES = json.loads((DATA / "manifest.json").read_text())


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_compress_matches_golden(case):
    cfg = RiceConfig.from_cd_values(case["cd_values"])
    data = np.load(DATA / f"{case['name']}.npy")
    golden = (DATA / f"{case['name']}.bin").read_bytes()
    assert drt.compress(data, cfg) == golden


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_decompress_matches_golden(case):
    cfg = RiceConfig.from_cd_values(case["cd_values"])
    data = np.load(DATA / f"{case['name']}.npy")
    golden = (DATA / f"{case['name']}.bin").read_bytes()
    np.testing.assert_array_equal(drt.decompress(golden, cfg), data)
