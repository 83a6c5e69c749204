"""image_restoration_sde_tpu — a TPU-native JAX framework for image restoration
with mean-reverting stochastic differential equations.

Re-implements the full capability surface of the reference IR-SDE / Refusion
stack (Algolzw/image-restoration-sde) as an idiomatic JAX/XLA/Pallas framework:

- ``sde``       : mean-reverting SDE math as pure functions over precomputed
                  schedule tables; sampling loops compiled to single XLA
                  programs via ``jax.lax.scan``.
- ``models``    : Flax score networks (ConditionalUNet, ConditionalNAFNet,
                  DiT, latent compressor UNet, stereo/bokeh variants), NHWC.
- ``ops``       : Pallas TPU kernels for the hot fused ops.
- ``parallel``  : device-mesh construction + sharding rules (dp/tp) for
                  pjit-compiled train steps.
- ``training``  : jitted train step, optimizers (Adam/AdamW/Lion), LR
                  schedules, EMA, checkpointing.
- ``data``      : paired LQ/GT input pipeline with reference-parity
                  augmentation and matlab-faithful bicubic resize.
- ``utils``     : YAML config system (reference option files run unchanged),
                  metrics (PSNR/SSIM), image IO, logging.
- ``exporting`` : AOT serving artifacts via jax.export — whole sampler
                  programs as versioned StableHLO (weights baked in,
                  cpu+tpu lowering, symbolic batch), served by
                  ``tools/serve.py`` without any model code.
"""

__version__ = "0.1.0"
