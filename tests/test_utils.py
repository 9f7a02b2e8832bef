"""CLAHE vs cv2, stage timer, verbose logging."""

import cv2
import numpy as np
import jax.numpy as jnp

from extractorb_tpu.utils.clahe import clahe
from extractorb_tpu.utils.timing import StageTimer


def test_clahe_close_to_cv2(luna_gray):
    img = cv2.resize(luna_gray, (640, 480))
    got = np.asarray(clahe(jnp.asarray(img), 3.0, 8))
    c = cv2.createCLAHE(3.0, (8, 8))
    exp = c.apply(img)
    diff = np.abs(got.astype(int) - exp.astype(int))
    assert diff.mean() < 3.0, diff.mean()
    assert np.median(diff) <= 2
    # contrast actually increased
    assert got.std() > img.std()


def test_stage_timer(tmp_path):
    t = StageTimer()
    with t.stage("extract"):
        sum(range(1000))
    with t.stage("extract"):
        sum(range(1000))
    with t.stage("pose-opt"):
        pass
    s = t.summary()
    assert s["extract"]["count"] == 2
    p = tmp_path / "times.csv"
    t.write_csv(str(p))
    assert "extract" in p.read_text()
