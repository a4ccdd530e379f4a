"""Golden-image regression: fixed-seed tiny renders on the CPU backend must
reproduce the committed tensors (SURVEY.md §4) for all three shipped scenes
(the BASELINE.md eval configs). Regenerate intentionally with
tools/gen_golden.py when the estimator changes."""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.mark.parametrize(
    "scene,mode",
    [("apollo", "path"), ("apollo", "preview"), ("florida", "path"), ("sunset", "path")],
)
def test_golden(scene, mode):
    path = os.path.join(GOLDEN_DIR, f"{scene}_{mode}.npz")
    if not os.path.exists(path):
        pytest.skip("golden not generated")
    from gen_golden import build_renderer

    golden = np.load(path)
    r = build_renderer(scene, mode)
    for _ in range(int(golden["spp"])):
        r.accumulate()
    buf = np.asarray(r.color_buffer)
    np.testing.assert_allclose(buf, golden["color_buffer"], rtol=1e-5, atol=1e-7)
    img = np.asarray(r.fetch_image())
    np.testing.assert_allclose(img, golden["image"], rtol=1e-5, atol=1e-5)
