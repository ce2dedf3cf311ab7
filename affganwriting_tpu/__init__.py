"""affganwriting_tpu — TPU-native styled-handwriting generation framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of
devo002/AFFGanWriting (word-level AFFGANwriting three-player GAN and the
line_generation stack).  Everything on the compute path is jit-compiled XLA
with explicit `jax.sharding` over a device mesh; the reference's per-image
Python loops become batched, fused TPU programs.

Layout conventions (TPU-native, unlike the reference's NCHW):
  * images are NHWC; the 50-image per-writer style stack rides the channel
    axis: ``(batch, 64, 216, 50)``.
  * compute dtype is configurable (bfloat16 by default on TPU), statistics
    and normalizations accumulate in float32.
  * all randomness is keyed from explicit ``jax.random`` keys: the same
    (seed, style stack, text) always yields the same image.

Package map (cf. SURVEY.md §7.1):
  core/      config registry, PRNG discipline, dtype policy, checkpointing
  data/      IAM indexing + per-writer style-stack sampling + host pipeline
  models/    flax modules: blocks, AdaIN+iAFF, text/style encoders, decoder,
             discriminator, writer classifier, seq2seq recognizer
  ops/       Pallas kernels + fused numerical primitives
  parallel/  mesh construction and sharding rules (DP over ICI, TP seams)
  train/     losses, 4-optimizer jit train step, training loop
  eval/      batched CER / FID / writer-retrieval pipelines
  gen/       batched deterministic inference
  cli/       user entry points mirroring the reference UX
"""

__version__ = "0.1.0"
