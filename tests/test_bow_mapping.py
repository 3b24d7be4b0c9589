"""Appearance-only loop closure on the real sample image sequence
(reference BOWMapping example parity)."""
import os

import pytest

SAMPLES = "/root/reference/data/samples"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="sample images not present")
def test_bow_mapping_detects_consistent_closures():
    from rtabmap_tpu.tools.bow_mapping import run

    closures = run(SAMPLES, verbose=False)
    assert len(closures) >= 10, f"only {len(closures)} closures"
    # closures must be sequentially consistent: consecutive query frames
    # should close with nearby (monotonically related) map nodes
    pairs = [(q, m) for q, m, _ in closures]
    consistent = 0
    for (q1, m1), (q2, m2) in zip(pairs, pairs[1:]):
        if q2 - q1 <= 3 and abs((m2 - m1) - (q2 - q1)) <= 4:
            consistent += 1
    assert consistent >= len(pairs) // 2, pairs
