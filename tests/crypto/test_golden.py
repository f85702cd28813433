"""Golden-vector regression test (SURVEY §4; VERDICT r1 item 8).

`golden_vectors.npz` pins the decrypted outputs of a fixed-seed pipeline
(see golden_pipeline.py).  Integer RNS arithmetic is exact and the host
encode path is deterministic float64, so the replayed outputs must match
the checked-in vectors to ~1e-9: any larger drift is a semantic change in
the crypto core (modops, NTT, keyswitch, rescale), not noise.
"""

from pathlib import Path

import numpy as np
import pytest

from .golden_pipeline import run_pipeline

GOLDEN = Path(__file__).parent / "golden_vectors.npz"


@pytest.mark.skipif(not GOLDEN.exists(), reason="golden vectors not generated")
def test_golden_vectors():
    want = np.load(GOLDEN)
    got = run_pipeline()
    assert set(want.files) == set(got), (
        f"pipeline stages changed: {sorted(set(want.files) ^ set(got))}")
    for name in want.files:
        np.testing.assert_allclose(
            got[name], want[name], atol=1e-9, rtol=0,
            err_msg=f"golden regression in stage '{name}'")
