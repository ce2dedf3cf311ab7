import os

import numpy as np

from affganwriting_tpu.eval.sheets import write_sheet


def test_write_sheet(tmp_path):
    b, h, w = 2, 64, 216
    rng = np.random.default_rng(0)
    path = write_sheet(
        str(tmp_path), "epoch_1",
        rng.normal(size=(b, h, w, 1)),
        ["deep", "scan"],
        rng.normal(size=(b, h, w, 1)),
        ["deep", "scan"],
        rng.normal(size=(b, h, w, 4)),
        rng.normal(size=(b, h, w, 1)),
        ["dep", "scans"],
        ["dep", "scans"],
    )
    assert os.path.exists(path) or os.path.exists(path + ".npy")
