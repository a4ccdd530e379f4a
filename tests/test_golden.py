"""Golden-image regression: fixed-seed tiny renders on the CPU backend must
reproduce the committed tensors (SURVEY.md §4). Regenerate intentionally with
tools/gen_golden.py when the estimator changes."""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("mode", ["path", "preview"])
def test_golden_apollo(mode):
    path = os.path.join(GOLDEN_DIR, f"apollo_{mode}.npz")
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gen_golden import build_renderer

    golden = np.load(path)
    r = build_renderer(mode)
    for _ in range(int(golden["spp"])):
        r.accumulate()
    buf = np.asarray(r.color_buffer)
    np.testing.assert_allclose(buf, golden["color_buffer"], rtol=1e-5, atol=1e-7)
    img = np.asarray(r.fetch_image())
    np.testing.assert_allclose(img, golden["image"], rtol=1e-5, atol=1e-5)
