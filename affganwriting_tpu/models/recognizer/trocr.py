"""TrOCR drop-in recognizer R (the "transformer recognizer" configuration).

Rebuild of the reference's ``TrOCRRecModel``
(GAN_word/trocr_recognizer.py:48-247, wired as R by main_runtransformer.py):
a frozen ViT-encoder / TrOCR-decoder vision-language model whose tokenizer
logits are projected back onto the project's 55-char vocab, with a fully
*differentiable* image preprocess so the recognition loss backpropagates
into the generator (but not into TrOCR itself).

TPU-first design decisions (vs the torch reference):

- The whole model is native flax — ViT encoder + TrOCR (post-norm BART-
  style) decoder — so the recognizer participates in the single jit'd
  four-player step instead of being a host-side HF call.  Weights import
  from a HuggingFace ``VisionEncoderDecoderModel`` torch state dict via
  :func:`import_torch_state_dict` (parity-tested against transformers).
- The reference tokenizes the label *strings* host-side per batch
  (trocr_recognizer.py:176-192, inside ``torch.no_grad``) which yields
  dynamic sequence lengths.  Here decoder inputs come from a static
  (vocab_55,) -> tokenizer-id table (the same per-char map the reference
  uses for its logits gather, :143-160), so the step stays shape-static:
  input t is labels[:, t] mapped to TrOCR ids, and logits[:, t] predicts
  labels[:, t+1] — identical to the project's seq2seq R convention.
- The logits projection is the reference's gather + valid-mask fill of
  -1e9 (trocr_recognizer.py:214-221), then time-padded to OUTPUT_MAX_LEN-1.

When no pretrained checkpoint exists in the environment the module runs
with random weights (a "SelfTeacher"-style stand-in, cf. train/teacher.py);
the architecture, import path, and vocab projection are what this module
guarantees.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from affganwriting_tpu.core.config import VOCAB


@dataclasses.dataclass(frozen=True)
class TrOCRArch:
    """Architecture hyper-parameters of the ViT-encoder/TrOCR-decoder pair."""

    # encoder (ViT)
    enc_hidden: int = 768
    enc_layers: int = 12
    enc_heads: int = 12
    enc_mlp: int = 3072
    image_size: int = 384
    patch_size: int = 16
    # decoder (TrOCR / BART-style post-norm causal LM)
    dec_hidden: int = 1024
    dec_layers: int = 12
    dec_heads: int = 16
    dec_ffn: int = 4096
    vocab_tro: int = 50265
    max_positions: int = 512
    scale_embedding: bool = False
    layernorm_embedding: bool = True
    # None -> if enc_hidden != dec_hidden an enc_to_dec_proj Linear is used;
    # an int means cross-attention k/v project straight from that width
    # (trocr-base-handwritten sets cross_attention_hidden_size=768).
    cross_attention_hidden_size: int | None = None

    @classmethod
    def base_handwritten(cls) -> "TrOCRArch":
        """microsoft/trocr-base-handwritten dims."""
        return cls(cross_attention_hidden_size=768)

    @classmethod
    def tiny(cls) -> "TrOCRArch":
        """Tiny dims for tests / weightless environments."""
        return cls(
            enc_hidden=32, enc_layers=2, enc_heads=2, enc_mlp=64,
            dec_hidden=32, dec_layers=2, dec_heads=2, dec_ffn=64,
            vocab_tro=384, max_positions=64,
        )


# --------------------------------------------------------------------------
# ViT encoder
# --------------------------------------------------------------------------


class ViTSelfAttention(nn.Module):
    hidden: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, t, _ = x.shape
        hd = self.hidden // self.heads

        def proj(name):
            y = nn.Dense(self.hidden, param_dtype=jnp.float32, name=name)(x)
            return y.reshape(b, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = proj("query"), proj("key"), proj("value")
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd),
            axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, self.hidden)
        return nn.Dense(self.hidden, param_dtype=jnp.float32, name="out")(ctx)


class ViTLayer(nn.Module):
    """Pre-norm ViT block (HF ViTLayer semantics)."""

    hidden: int
    heads: int
    mlp: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(param_dtype=jnp.float32, name="ln_before")(x)
        x = x + ViTSelfAttention(self.hidden, self.heads, name="attn")(h)
        h = nn.LayerNorm(param_dtype=jnp.float32, name="ln_after")(x)
        h = nn.Dense(self.mlp, param_dtype=jnp.float32, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, param_dtype=jnp.float32, name="fc2")(h)
        return x + h


class ViTEncoder(nn.Module):
    """HF ViTModel (no pooler): patchify + cls + learned pos, L pre-norm
    blocks, final LayerNorm."""

    arch: TrOCRArch

    @nn.compact
    def __call__(self, pixels):  # (B, S, S, 3)
        a = self.arch
        n_patches = (a.image_size // a.patch_size) ** 2
        x = nn.Conv(a.enc_hidden,
                    (a.patch_size, a.patch_size),
                    strides=(a.patch_size, a.patch_size),
                    param_dtype=jnp.float32, name="patch_proj")(pixels)
        b = x.shape[0]
        x = x.reshape(b, n_patches, a.enc_hidden)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, a.enc_hidden), jnp.float32)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, n_patches + 1, a.enc_hidden), jnp.float32)
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, a.enc_hidden)), x],
                            axis=1) + pos
        for i in range(a.enc_layers):
            x = ViTLayer(a.enc_hidden, a.enc_heads, a.enc_mlp,
                         name=f"layer{i}")(x)
        return nn.LayerNorm(param_dtype=jnp.float32, name="ln_final")(x)


# --------------------------------------------------------------------------
# TrOCR decoder (BART-style post-norm causal LM with cross-attention)
# --------------------------------------------------------------------------


class TrOCRAttention(nn.Module):
    hidden: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x, kv=None):
        if kv is None:
            kv = x
        b, t, _ = x.shape
        s = kv.shape[1]
        hd = self.hidden // self.heads

        q = nn.Dense(self.hidden, param_dtype=jnp.float32, name="q_proj")(x)
        k = nn.Dense(self.hidden, param_dtype=jnp.float32, name="k_proj")(kv)
        v = nn.Dense(self.hidden, param_dtype=jnp.float32, name="v_proj")(kv)
        q = (q * (hd ** -0.5)).reshape(b, t, self.heads, hd)
        k = k.reshape(b, s, self.heads, hd)
        v = v.reshape(b, s, self.heads, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if self.causal:
            mask = jnp.tril(jnp.ones((t, s), bool))
            scores = jnp.where(mask[None, None], scores, -1e9)
        attn = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32)
        ctx = ctx.reshape(b, t, self.hidden)
        return nn.Dense(self.hidden, param_dtype=jnp.float32,
                        name="out_proj")(ctx)


class TrOCRDecoderLayer(nn.Module):
    """Post-norm: attn -> +res -> LN; cross -> +res -> LN; FFN -> +res -> LN."""

    arch: TrOCRArch

    @nn.compact
    def __call__(self, x, enc):
        a = self.arch
        x = x + TrOCRAttention(a.dec_hidden, a.dec_heads, causal=True,
                               name="self_attn")(x)
        x = nn.LayerNorm(param_dtype=jnp.float32, name="self_attn_ln")(x)
        x = x + TrOCRAttention(a.dec_hidden, a.dec_heads,
                               name="encoder_attn")(x, enc)
        x = nn.LayerNorm(param_dtype=jnp.float32, name="encoder_attn_ln")(x)
        h = nn.Dense(a.dec_ffn, param_dtype=jnp.float32, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(a.dec_hidden, param_dtype=jnp.float32, name="fc2")(h)
        return nn.LayerNorm(param_dtype=jnp.float32, name="final_ln")(x + h)


class TrOCRDecoder(nn.Module):
    arch: TrOCRArch

    @nn.compact
    def __call__(self, input_ids, enc):  # (B, T), (B, S, E)
        a = self.arch
        emb = nn.Embed(a.vocab_tro, a.dec_hidden, param_dtype=jnp.float32,
                       name="embed_tokens")(input_ids)
        if a.scale_embedding:
            emb = emb * np.sqrt(a.dec_hidden)
        # learned positions with the BART +2 offset
        # (transformers TrOCRLearnedPositionalEmbedding)
        t = input_ids.shape[1]
        pos_table = self.param(
            "embed_positions", nn.initializers.zeros,
            (a.max_positions + 2, a.dec_hidden), jnp.float32)
        x = emb + pos_table[2:t + 2][None]
        if a.layernorm_embedding:
            x = nn.LayerNorm(param_dtype=jnp.float32, name="ln_embed")(x)
        for i in range(a.dec_layers):
            x = TrOCRDecoderLayer(a, name=f"layer{i}")(x, enc)
        return nn.Dense(a.vocab_tro, use_bias=False, param_dtype=jnp.float32,
                        name="output_projection")(x)


class TrOCRCore(nn.Module):
    """pixel_values (B, S, S, 3) + decoder_input_ids (B, T) -> tokenizer
    logits (B, T, vocab_tro).  Mirrors HF VisionEncoderDecoderModel."""

    arch: TrOCRArch

    @nn.compact
    def __call__(self, pixels, input_ids):
        a = self.arch
        enc = ViTEncoder(a, name="encoder")(pixels)
        if (a.cross_attention_hidden_size is None
                and a.enc_hidden != a.dec_hidden):
            enc = nn.Dense(a.dec_hidden, param_dtype=jnp.float32,
                           name="enc_to_dec_proj")(enc)
        return TrOCRDecoder(a, name="decoder")(input_ids, enc)


# --------------------------------------------------------------------------
# vocab-55 <-> tokenizer-id mapping
# --------------------------------------------------------------------------


def default_char_token_table(vocab_tro: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic per-char tokenizer-id table used when no HF tokenizer
    is available: GO -> <s>(0), END -> </s>(2), PAD -> <pad>(1), letter c ->
    a stable id derived from its codepoint.  Injective by construction.

    Returns (map_vec (55,), valid_mask (55,)).
    """
    v = VOCAB.size
    map_vec = np.zeros((v,), np.int64)
    valid = np.zeros((v,), bool)
    map_vec[VOCAB.go], map_vec[VOCAB.pad], map_vec[VOCAB.end] = 0, 1, 2
    # END is a live class: it maps to the tokenizer's eos and IS a target
    # after the GO-shift (the reference leaves it masked and eats a
    # constant penalty on every end-of-word row, trocr_recognizer.py:159)
    valid[VOCAB.end] = True
    for i, ch in enumerate(VOCAB.letters):
        tid = 10 + ord(ch)
        if tid >= vocab_tro:
            tid = tid % vocab_tro
        map_vec[VOCAB.num_tokens + i] = tid
        valid[VOCAB.num_tokens + i] = True
    return map_vec, valid


def table_from_tokenizer(tokenizer) -> tuple[np.ndarray, np.ndarray]:
    """Build the (map_vec, valid_mask) pair from a real HF tokenizer using
    the reference's first-token-id-per-char rule
    (trocr_recognizer.py:143-160)."""
    v = VOCAB.size
    map_vec = np.zeros((v,), np.int64)
    valid = np.zeros((v,), bool)
    map_vec[VOCAB.go] = int(tokenizer.bos_token_id or 0)
    map_vec[VOCAB.pad] = int(tokenizer.pad_token_id or 1)
    map_vec[VOCAB.end] = int(tokenizer.eos_token_id or 2)
    valid[VOCAB.end] = True   # see default_char_token_table
    for i, ch in enumerate(VOCAB.letters):
        ids = tokenizer(ch, add_special_tokens=False)["input_ids"]
        if ids:
            map_vec[VOCAB.num_tokens + i] = int(ids[0])
            valid[VOCAB.num_tokens + i] = True
    return map_vec, valid


# --------------------------------------------------------------------------
# differentiable preprocess
# --------------------------------------------------------------------------


def preprocess_for_trocr(img: jax.Array, size: int = 384,
                         mean: float = 0.5, std: float = 0.5) -> jax.Array:
    """(B, H, W, 1) in [-1, 1] -> (B, size, size, 3) normalized.

    Aspect-preserving bilinear resize + right/bottom zero pad, all XLA ops
    so gradients reach the generator (reference
    trocr_recognizer.py:_ensure_rgb_and_square, :48-76; normalization
    :199-203).  H/W are static so the resize shape is static.
    """
    x = jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)
    x = jnp.repeat(x, 3, axis=-1)
    b, h, w, _ = x.shape
    scale = min(size / max(1, h), size / max(1, w))
    nh = max(1, int(round(h * scale)))
    nw = max(1, int(round(w * scale)))
    x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
    x = jnp.pad(x, ((0, 0), (0, size - nh), (0, size - nw), (0, 0)))
    return (x - mean) / std


# --------------------------------------------------------------------------
# the drop-in recognizer
# --------------------------------------------------------------------------


class TrOCRRecognizer(nn.Module):
    """Drop-in R: ``(img (B,H,W,1), labels (B,T)) -> (logits (B,T-1,55),
    None)`` — the same contract as the seq2seq ``Recognizer``.

    Decoder input t is labels[:, t] mapped through the char->token table,
    so logits[:, t] predicts labels[:, t+1]; the tokenizer logits are
    gathered back onto the 55-vocab and invalid rows masked to -1e9
    (reference trocr_recognizer.py:205-243).
    """

    arch: TrOCRArch
    output_max_len: int = 12
    map_vec: tuple = ()      # static (55,) char->token table
    valid_mask: tuple = ()   # static (55,) bool

    def setup(self):
        self.core = TrOCRCore(self.arch, name="core")
        if self.map_vec:
            mv = np.asarray(self.map_vec, np.int64)
            vm = np.asarray(self.valid_mask, bool)
        else:
            mv, vm = default_char_token_table(self.arch.vocab_tro)
        self._mv = jnp.asarray(mv, jnp.int32)
        self._vm = jnp.asarray(vm)

    # Invalid-class fill.  The reference uses -1e9
    # (trocr_recognizer.py:221) which explodes the label-smoothed KLDiv —
    # smoothing mass lands on the masked classes and multiplies the -1e9
    # log-prob (their commented-out `/100000000.0` hack at :236 is the
    # scar).  A finite -30 keeps softmax mass at e^-30 ~ 0 while bounding
    # the loss.
    MASK_FILL = -30.0

    def __call__(self, img, labels, train: bool = False):
        pixels = preprocess_for_trocr(img, self.arch.image_size)
        dec_in = jnp.take(self._mv, labels[:, :-1], axis=0)   # (B, T-1)
        logits_tro = self.core(pixels, dec_in)                # (B, T-1, Vt)
        logits = jnp.take(logits_tro, self._mv, axis=-1)      # (B, T-1, 55)
        logits = jnp.where(self._vm[None, None], logits, self.MASK_FILL)
        t = logits.shape[1]
        want = self.output_max_len - 1
        if t < want:
            pad = jnp.full((logits.shape[0], want - t, logits.shape[-1]),
                           self.MASK_FILL, logits.dtype)
            logits = jnp.concatenate([logits, pad], axis=1)
        elif t > want:
            logits = logits[:, :want]
        return logits.astype(jnp.float32), None


# --------------------------------------------------------------------------
# torch (HuggingFace) weight import
# --------------------------------------------------------------------------


def import_torch_state_dict(sd, arch: TrOCRArch):
    """Convert a HF ``VisionEncoderDecoderModel.state_dict()`` (ViT encoder
    + TrOCR decoder) into this module's flax param tree for ``TrOCRCore``.

    Torch Linear kernels transpose to flax (in, out); the ViT patch conv
    (O,I,kh,kw) transposes to flax (kh,kw,I,O).
    """

    def t(name):
        x = sd[name]
        arr = x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
        return np.asarray(arr, np.float32)

    def lin(prefix):
        return {"kernel": t(prefix + ".weight").T, "bias": t(prefix + ".bias")}

    def ln(prefix):
        return {"scale": t(prefix + ".weight"), "bias": t(prefix + ".bias")}

    enc: dict = {
        "patch_proj": {
            "kernel": t("encoder.embeddings.patch_embeddings.projection.weight"
                        ).transpose(2, 3, 1, 0),
            "bias": t("encoder.embeddings.patch_embeddings.projection.bias"),
        },
        "cls_token": t("encoder.embeddings.cls_token"),
        "pos_embed": t("encoder.embeddings.position_embeddings"),
        "ln_final": ln("encoder.layernorm"),
    }
    for i in range(arch.enc_layers):
        p = f"encoder.encoder.layer.{i}"
        enc[f"layer{i}"] = {
            "ln_before": ln(f"{p}.layernorm_before"),
            "ln_after": ln(f"{p}.layernorm_after"),
            "attn": {
                "query": lin(f"{p}.attention.attention.query"),
                "key": lin(f"{p}.attention.attention.key"),
                "value": lin(f"{p}.attention.attention.value"),
                "out": lin(f"{p}.attention.output.dense"),
            },
            "fc1": lin(f"{p}.intermediate.dense"),
            "fc2": lin(f"{p}.output.dense"),
        }

    dec: dict = {
        "embed_tokens": {
            "embedding": t("decoder.model.decoder.embed_tokens.weight")},
        "embed_positions": t("decoder.model.decoder.embed_positions.weight"),
        "output_projection": {
            "kernel": t("decoder.output_projection.weight").T},
    }
    if arch.layernorm_embedding:
        dec["ln_embed"] = ln("decoder.model.decoder.layernorm_embedding")
    for i in range(arch.dec_layers):
        p = f"decoder.model.decoder.layers.{i}"

        def attnmod(ap):
            return {
                "q_proj": lin(f"{ap}.q_proj"),
                "k_proj": lin(f"{ap}.k_proj"),
                "v_proj": lin(f"{ap}.v_proj"),
                "out_proj": lin(f"{ap}.out_proj"),
            }

        dec[f"layer{i}"] = {
            "self_attn": attnmod(f"{p}.self_attn"),
            "self_attn_ln": ln(f"{p}.self_attn_layer_norm"),
            "encoder_attn": attnmod(f"{p}.encoder_attn"),
            "encoder_attn_ln": ln(f"{p}.encoder_attn_layer_norm"),
            "fc1": lin(f"{p}.fc1"),
            "fc2": lin(f"{p}.fc2"),
            "final_ln": ln(f"{p}.final_layer_norm"),
        }

    params: dict = {"encoder": enc, "decoder": dec}
    if "enc_to_dec_proj.weight" in sd:
        params["enc_to_dec_proj"] = lin("enc_to_dec_proj")
    return jax.tree.map(jnp.asarray, params)


def load_pretrained(ckpt_dir: str, arch: TrOCRArch | None = None):
    """Load a local HF trocr checkpoint directory into (params, map_vec,
    valid_mask).  Returns None if the directory or deps are unavailable."""
    import os

    if not os.path.isdir(ckpt_dir):
        return None
    try:
        from transformers import TrOCRProcessor, VisionEncoderDecoderModel
    except Exception:
        return None
    model = VisionEncoderDecoderModel.from_pretrained(
        ckpt_dir, local_files_only=True)
    arch = arch or TrOCRArch.base_handwritten()
    params = import_torch_state_dict(model.state_dict(), arch)
    try:
        proc = TrOCRProcessor.from_pretrained(ckpt_dir, local_files_only=True)
        mv, vm = table_from_tokenizer(proc.tokenizer)
    except Exception:
        mv, vm = default_char_token_table(arch.vocab_tro)
    return params, mv, vm
