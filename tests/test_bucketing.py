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


def test_synthetic_line_label_matches_rendered_text():
    """The label must describe what the image shows: tail words that do
    not fit the canvas are dropped from BOTH (pre-round-4 they stayed in
    the label — an irreducible ~35% CER floor for the HWR pretrain)."""
    from affganwriting_tpu.data.lines import (
        LineCharset,
        LineDataset,
        synthetic_line_image,
    )

    long_text = "antidisestablishment words keep marching onwards forever"
    img, drawn = synthetic_line_image(long_text, 7, width=256,
                                      return_text=True)
    assert drawn and len(drawn) < len(long_text)   # tail dropped
    assert long_text.startswith(drawn)             # a word-boundary prefix
    # every drawn word fully fits: the canvas has ink where words are and
    # the last 8 columns stay background (words never straddle the edge)
    assert (img[:, -8:] == -1.0).all()
    assert (img.max() > -1.0)

    # degenerate canvas: still a consistent (image, label) pair
    _, tiny = synthetic_line_image("supercalifragilistic", 7, width=64,
                                   return_text=True)
    assert tiny and "supercalifragilistic".startswith(tiny)

    # the dataset's labels encode the drawn text and ride with 'texts'
    cs = LineCharset()
    ds = LineDataset(cs, a_batch_size=1, width=256, label_len=48, seed=0)
    b = next(ds.batches(batch_authors=2))
    assert "texts" in b
    for i, t in enumerate(b["texts"]):
        got = cs.decode(np.asarray(b["label"][i])[: int(b["label_lengths"][i])])
        assert got == t[: len(got)] and len(got) >= 1
