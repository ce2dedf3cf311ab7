"""Typed configuration for the word-level AFFGAN stack.

The reference selects backbones by commenting/uncommenting constructor lines
(reference: GAN_word/modules_tro.py:211-219) and keeps its hyper-parameters as
module-level constants (GAN_word/load_data.py:9-29, main_runold.py:30-45).
Here everything is a frozen dataclass plus a string registry, so a config is a
value that can be serialized into checkpoints and threaded through jit.
"""

from __future__ import annotations

import dataclasses
import json
import string
from typing import Any


@dataclasses.dataclass(frozen=True)
class Vocab:
    """Charset a-zA-Z plus GO/END/PAD control tokens.

    Mirrors the label scheme of the reference (GAN_word/load_data.py:31-40):
    letters are offset by ``num_tokens`` so ids 0/1/2 are GO/END/PAD.
    """

    letters: str = string.ascii_lowercase + string.ascii_uppercase
    go: int = 0
    end: int = 1
    pad: int = 2

    @property
    def num_tokens(self) -> int:
        return 3

    @property
    def size(self) -> int:
        return len(self.letters) + self.num_tokens  # 55

    def encode(self, word: str) -> list[int]:
        idx = {c: i for i, c in enumerate(self.letters)}
        return [idx[c] + self.num_tokens for c in word]

    def decode(self, ids) -> str:
        out = []
        for i in ids:
            i = int(i)
            if i >= self.num_tokens:
                out.append(self.letters[i - self.num_tokens])
        return "".join(out)

    def pad_label(self, word: str, max_len: int) -> list[int]:
        """GO + chars + END, padded with PAD to ``max_len``.

        Reference: GAN_word/load_data.py:169-179 (label_padding).
        """
        ll = [self.go] + self.encode(word) + [self.end]
        ll += [self.pad] * (max_len - len(ll))
        return ll


VOCAB = Vocab()


@dataclasses.dataclass(frozen=True)
class WordGanConfig:
    """Hyper-parameters of the word-level three-player GAN.

    Defaults reproduce the reference's active configuration
    (GAN_word/load_data.py:11-19, main_runold.py:30-45).
    """

    # --- geometry ---
    img_height: int = 64
    img_width: int = 216
    max_chars: int = 10
    style_stack: int = 50          # NUM_CHANNEL: per-writer style images
    num_writers: int = 500
    # --- model ---
    style_encoder: str = "resnet50"  # registry key; see models/style_encoders
    style_dim: int = 512
    text_embed_dim: int = 64
    adain_param_dim: int = 4096
    dis_layers: int = 6
    dis_final_size: int = 1024
    recognizer: str = "seq2seq"    # "seq2seq" | "trocr" (drop-in R,
    #                                reference trocr_recognizer.py:101-243)
    rec_frozen: bool = False       # freeze R's params (TrOCR drop-in keeps
    #                                TrOCR frozen; grads still reach G)
    trocr_preset: str = "tiny"     # "tiny" | "base" arch when recognizer=trocr
    # char->token table from the real tokenizer when importing pretrained
    # TrOCR weights (reference trocr_recognizer.py:143-160); empty = the
    # deterministic default table (ids 10+ord(ch))
    trocr_map_vec: tuple = ()      # static (55,) char->token ids
    trocr_valid_mask: tuple = ()   # static (55,) bool
    rec_hidden: int = 512
    rec_embed: int = 60
    attn_filters: int = 128        # K, recognizer location attention
    attn_kernel: int = 7           # R
    # lax.scan unroll for R's recurrences (BiGRU 13 steps, decoder 11).
    # 1 = rolled loops (fast compile; CPU tests); the step counts
    # themselves = straight-line HLO, which XLA pipelines far better on
    # TPU — the four-player step is latency-bound on these scans
    # (docs/ARCHITECTURE.md round-3 accounting)
    rec_scan_unroll: int = 1
    label_smoothing: float = 0.4
    # --- training ---
    optimizer: str = "adam"        # "adam" (reference main_runold.py:244-247)
    #                                | "sgd" (plain p-lr*g; used by the DP
    #                                equivalence test, where Adam's
    #                                sign-normalization of numerically-zero
    #                                grads hides/injects float noise)
    batch_size: int = 8
    lr_dis: float = 1e-4
    lr_gen: float = 1e-4
    lr_rec: float = 1e-5
    lr_cla: float = 1e-5
    w_dis: float = 1.0
    w_cla: float = 1.0
    w_l1: float = 0.0
    w_rec: float = 1.0
    oov: bool = True
    # --- TPU execution ---
    # fuse the D and G phases into one program sharing G's pair forward
    # via jax.vjp (train/step.py:make_phased_train_step merge_dg) — kills
    # the structural recompute of the 4-program form.  Measured 1.09x the
    # 4-program step at batch 64 on v5e with identical update semantics
    # (cli/profile_pipeline.py --stages train_phases; equivalence test
    # tests/test_train_step.py::test_merged_dg_step_matches_phased)
    merge_dg: bool = True
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    mesh_data_axis: str = "data"
    mesh_model_axis: str = "model"

    @property
    def output_max_len(self) -> int:
        # <GO> + chars + <END>  (reference: load_data.py:19)
        return self.max_chars + 2

    @property
    def vocab_size(self) -> int:
        return VOCAB.size

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "WordGanConfig":
        raw: dict[str, Any] = json.loads(s)
        fields = {f.name for f in dataclasses.fields(cls)}
        # JSON has no tuples; tuple-typed fields (the static TrOCR token
        # tables) must come back hashable for flax module attributes
        return cls(**{k: tuple(v) if isinstance(v, list) else v
                      for k, v in raw.items() if k in fields})

    def replace(self, **kw) -> "WordGanConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> WordGanConfig:
    return WordGanConfig()
