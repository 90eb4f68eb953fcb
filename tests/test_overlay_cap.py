"""--plt_max: pred_store's overlay writer caps at overlay_max files while
still accumulating metrics over every sample (the cap only affects JPEG
output, never the store)."""

import glob
import os

import numpy as np

from lighthand_tpu.data.pipeline import Loader
from lighthand_tpu.data.synthetic import SyntheticHands
from lighthand_tpu.eval.harness import pred_store


def test_pred_store_overlay_max(tmp_path):
    bs, n = 8, 24
    src = SyntheticHands(length=n, size=32, seed=77, with_visibility=True)
    loader = Loader(src, bs, mesh=None, shuffle=False, num_workers=2,
                    drop_last=False)
    out_json = str(tmp_path / "evaluation.json")
    ov = str(tmp_path / "ov")

    def predict(images):
        return np.zeros((images.shape[0], 21, 2), np.float32)

    store = pred_store(loader, predict, out_json,
                       overlay_dir=ov, overlay_max=3)
    jpgs = glob.glob(os.path.join(ov, "eval_image", "*", "*.jpg"))
    assert len(jpgs) == 3
    total = sum(len(v["pred"]) for v in store.values())
    assert total == n  # every sample still counted in the store
