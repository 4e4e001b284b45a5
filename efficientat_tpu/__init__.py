"""efficientat_tpu — a TPU-native audio-tagging framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
fschmid56/EfficientAT (MobileNetV3 / Dynamic-MobileNet audio tagging,
AudioSet knowledge distillation, downstream fine-tuning), built TPU-first:

- the log-mel front-end is formulated as MXU GEMMs (windowed rDFT as a
  matrix multiply) with an optional fully fused Pallas kernel,
- models are flax.linen modules in NHWC layout lowering cleanly to XLA,
- per-sample dynamic convolutions are expressed as batched einsums and
  shift-and-add depthwise updates instead of CUDA grouped-conv folds,
- scaling is one `jax.sharding.Mesh` with a `data` axis over ICI,
- long-form audio runs as a batched sliding-window scan on device.

Reference behavior citations point into the upstream repo as
`<file>:<lines>` (see SURVEY.md).
"""

__version__ = "0.1.0"
