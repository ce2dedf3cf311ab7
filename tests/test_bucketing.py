import numpy as np

from affganwriting_tpu.data.lines import bucket_width, bucketize


def test_bucket_width():
    assert bucket_width(1) == 128
    assert bucket_width(128) == 128
    assert bucket_width(129) == 256
    assert bucket_width(5000, max_width=2048) == 2048


def test_bucketize_groups_and_pads():
    rng = np.random.default_rng(0)
    items = []
    for w in (100, 120, 200, 260, 90):
        items.append({
            "image": rng.normal(size=(64, w, 1)).astype(np.float32),
            "label": np.arange(5, dtype=np.int32),
        })
    batches = list(bucketize(items, bucket=128, batch_size=2))
    widths = sorted(b["image"].shape[2] for b in batches)
    assert set(widths) <= {128, 256, 384}
    # bucket 128 holds the three <=128 items => 2 batches (2 + 1)
    b128 = [b for b in batches if b["image"].shape[2] == 128]
    assert sum(b["image"].shape[0] for b in b128) == 3
    for b in batches:
        assert (b["width"] <= b["image"].shape[2]).all()
        # padding is background -1
        i0 = b["image"][0]
        w0 = int(b["width"][0])
        if w0 < i0.shape[1]:
            assert np.allclose(i0[:, w0:], -1.0)
        assert b["label"].shape == (b["image"].shape[0], 5)
