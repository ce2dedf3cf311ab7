"""Web app: styled line generation (``streamlit run .../serve/app.py``).

Rebuild of line_generation/app.py:32-421: load a checkpoint + style
library + charset; pick a style from the library (author, index) or extract
one from an uploaded reference image; type text; generate; download PNG.
The backend is the batched jit generation function — the interactive path
shares the exact code the eval sweeps use.

The alternative Emuru autoregressive backend (app.py:152-215) wraps a local
HF snapshot when one exists (``EMURU_DIR``); it is host-side torch inference
and optional — absent weights simply hide the backend, nothing downloads.
Streamlit itself is optional: ``python -m affganwriting_tpu.serve.app
--selftest`` exercises the full generation path headlessly.
"""

from __future__ import annotations

import io
import os
import sys

import numpy as np


def _load_backend(ckpt_dir=None, styles_path=None, seed=0,
                  max_gen_length=128, width=256, n_authors=None):
    import jax

    from affganwriting_tpu.data.lines import LineCharset, LineDataset
    from affganwriting_tpu.gen.line_inference import (
        StyleLibrary,
        extract_styles,
        generate_lines,
    )
    from affganwriting_tpu.train.line_trainer import LineGanTrainer

    charset = LineCharset()
    authors = [f"a{i:03d}" for i in range(n_authors)] if n_authors else None
    ds = LineDataset(charset, authors=authors, a_batch_size=1, width=width,
                     label_len=24)
    first = next(ds.batches(batch_authors=2))
    if ckpt_dir and os.path.exists(
            os.path.join(ckpt_dir, "latest.config.json")):
        # a LineCheckpointManager run dir: rebuild the trained model from
        # the embedded config (reference app.py:65-77)
        from affganwriting_tpu.core.checkpoint import restore_line_trainer

        name = "best" if os.path.exists(
            os.path.join(ckpt_dir, "best")) else "latest"
        trainer, payload = restore_line_trainer(ckpt_dir, first, name=name)
        state = payload["state"]
    else:
        trainer = LineGanTrainer(
            n_class=charset.n_class, max_gen_length=max_gen_length)
        state = trainer.init_state(first, jax.random.key(seed))
        if ckpt_dir:
            # bare orbax LineState dir (pre-manager format)
            import orbax.checkpoint as ocp

            # explicit this-backend sharding: a TPU-trained checkpoint must
            # load in a CPU serving process (core/checkpoint.py:restore)
            sh = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            shapes = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
                state)
            state = ocp.StandardCheckpointer().restore(ckpt_dir, shapes)
    if styles_path and os.path.exists(styles_path):
        library = StyleLibrary.load(styles_path)
    else:
        library = extract_styles(
            trainer, state, ds.batches(batch_authors=2))
    return trainer, state, library, charset


def _to_png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    arr = ((img[..., 0] * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(255 - arr, mode="L").save(buf, format="PNG")
    return buf.getvalue()


def _maybe_emuru():
    """Local Emuru snapshot path, or None (serve/emuru.py discovery)."""
    try:
        from affganwriting_tpu.serve.emuru import find_local_snapshot

        return find_local_snapshot()
    except Exception:
        return None


def run_streamlit():
    import jax
    import streamlit as st

    from affganwriting_tpu.gen.line_inference import generate_lines, interpolate

    st.title("TPU handwriting line generation")
    ckpt = st.sidebar.text_input("Checkpoint dir", "")
    styles = st.sidebar.text_input("Style library (.pkl)", "")

    @st.cache_resource
    def backend(ckpt, styles):
        return _load_backend(ckpt or None, styles or None)

    trainer, state, library, charset = backend(ckpt, styles)

    authors = sorted(library.by_author)
    author = st.selectbox("Author", authors)
    index = st.number_input(
        "Sample", 0, max(0, len(library.by_author[author]) - 1), 0)
    text = st.text_input("Text", "The quick brown fox")
    seed = st.number_input("Seed", 0, 10_000, 0)
    if st.button("Generate"):
        style = library.get(author, int(index))
        img = generate_lines(
            trainer, state, [text], style[None], charset,
            key=jax.random.key(int(seed)))
        st.image(_to_png_bytes(img[0]))
        st.download_button("Download PNG", _to_png_bytes(img[0]),
                           file_name="generated.png")
    if st.button("Interpolation sweep") and len(authors) >= 2:
        a = library.author_average(authors[0])
        b = library.author_average(authors[-1])
        sweep = interpolate(a, b, steps=6)
        imgs = generate_lines(
            trainer, state, [text] * 6, sweep, charset,
            key=jax.random.key(int(seed)))
        for im in imgs:
            st.image(_to_png_bytes(im))
    snapshot = _maybe_emuru()
    if snapshot:
        # Emuru autoregressive backend (reference app.py:152-215 +
        # emuru_infer.py): a style image + its transcription + target text
        # -> generated line, host-side torch over the local snapshot
        st.header("Emuru backend")
        st.caption(f"snapshot: {snapshot}")
        up = st.file_uploader("Style image (a handwriting line)",
                              type=("png", "jpg", "jpeg"))
        style_text = st.text_input("Style image transcription", "")
        gen_text = st.text_input("Emuru text", "The quick brown fox")
        if st.button("Generate (Emuru)") and up is not None:
            from PIL import Image

            from affganwriting_tpu.serve.emuru import generate_emuru

            out = generate_emuru(
                Image.open(up), style_text, gen_text)
            buf = io.BytesIO()
            out.save(buf, format="PNG")
            st.image(buf.getvalue())
            st.download_button("Download PNG", buf.getvalue(),
                               file_name="emuru.png")


def selftest():
    import jax

    from affganwriting_tpu.gen.line_inference import generate_lines

    trainer, state, library, charset = _load_backend(
        max_gen_length=48, width=128, n_authors=4)
    author = sorted(library.by_author)[0]
    img = generate_lines(
        trainer, state, ["Hello world"], library.get(author)[None], charset,
        key=jax.random.key(0))
    png = _to_png_bytes(img[0])
    # Emuru backend: generates with a local snapshot, raises cleanly
    # (FileNotFoundError) without one — never downloads
    from affganwriting_tpu.serve import emuru

    if emuru.available():
        emuru_status = f"available ({emuru.find_local_snapshot()})"
    else:
        try:
            emuru.load_emuru()
            raise AssertionError("load_emuru must raise without a snapshot")
        except FileNotFoundError as e:
            emuru_status = f"absent, raises cleanly ({e})"
    print(f"selftest ok: image {img.shape}, png {len(png)} bytes, "
          f"{len(library.styles)} styles from {len(library.by_author)} "
          f"authors; emuru: {emuru_status}")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        selftest()
    else:
        run_streamlit()
