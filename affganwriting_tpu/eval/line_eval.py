"""Dataset-wide line evaluation driver.

Rebuild of line_generation/new_eval.py + evaluators/hwdataset_eval.py: over
a split, compute per-instance (a) autoencode reconstruction L1, (b) CER/WER
of the recognizer on real lines (naive CTC decode, trainer:904-924), (c)
CER of the recognizer on *generated* lines (legibility), and collect style
vectors for retrieval metrics.  Everything batched jit calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.eval.cer import wer
from affganwriting_tpu.gen.line_inference import StyleLibrary, writer_retrieval


def _levenshtein(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev = dp[0]
        dp[0] = i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[len(b)]


def evaluate_lines(trainer, state, batches, charset, key=None,
                   max_batches: int | None = None) -> dict:
    key = key if key is not None else jax.random.key(0)
    rec_eds, rec_lens = 0, 0
    gen_eds, gen_lens = 0, 0
    l1s = []
    pred_texts, gt_texts = [], []
    styles, authors = [], []

    recognize = jax.jit(
        lambda v, i: trainer.model.apply(v, i, method=trainer.model.recognize))
    extract = jax.jit(
        lambda v, i: trainer.model.apply(
            v, i, method=trainer.model.extract_style))
    generate = jax.jit(
        lambda v, la, le, st, r: trainer.model.apply(v, la, le, st, rngs=r))

    n = 0
    for batch in batches:
        if max_batches is not None and n >= max_batches:
            break
        n += 1
        variables = trainer._variables(state)
        img = jnp.asarray(batch["image"])
        label = jnp.asarray(batch["label"])
        lengths = jnp.asarray(batch["label_lengths"])

        # (a)+(b): recognizer on real lines
        logp = np.asarray(recognize(variables, img))
        style, _ = extract(variables, img)
        styles.append(np.asarray(style))
        authors.extend(batch["authors"])

        key, k1, k2, k3 = jax.random.split(key, 4)
        gen_img, _, _ = generate(
            variables, label, lengths, style,
            {"noise": k1, "spacing": k2, "dropout": k3})
        gen_logp = np.asarray(recognize(variables, jnp.asarray(gen_img)))

        for i in range(img.shape[0]):
            gt = charset.decode(
                np.asarray(label[i])[: int(lengths[i])])
            pred = charset.ctc_collapse(np.argmax(logp[i], axis=-1))
            gen_pred = charset.ctc_collapse(np.argmax(gen_logp[i], axis=-1))
            rec_eds += _levenshtein(pred, gt)
            rec_lens += max(len(gt), 1)
            gen_eds += _levenshtein(gen_pred, gt)
            gen_lens += max(len(gt), 1)
            pred_texts.append(pred)
            gt_texts.append(gt)

        # reconstruction L1 via the autoencode path (spaced from DTW)
        spaced = trainer.spaced_label(state, batch)
        t = trainer.max_gen_length
        sp = np.zeros((spaced.shape[0], t), spaced.dtype)
        sp[:, : min(t, spaced.shape[1])] = spaced[:, :t]
        key, k1 = jax.random.split(key)
        recon, _, _ = generate(
            variables, label, lengths, style,
            {"noise": k1, "spacing": k1, "dropout": k1})
        w = min(recon.shape[2], img.shape[2])
        l1s.append(float(jnp.mean(jnp.abs(
            recon[:, :, :w].astype(jnp.float32)
            - img[:, :, :w].astype(jnp.float32)))))

    library = StyleLibrary(
        np.concatenate(styles) if styles else np.zeros((0, 1)),
        authors, list(range(len(authors))))
    out = {
        "rec_cer": 100.0 * rec_eds / max(rec_lens, 1),
        "gen_cer": 100.0 * gen_eds / max(gen_lens, 1),
        "recon_l1": float(np.mean(l1s)) if l1s else 0.0,
        "wer": wer(pred_texts, gt_texts) if pred_texts else 0.0,
    }
    if len(set(authors)) > 1:
        out.update(writer_retrieval(library, top_k=(1, 5)))
    return out
