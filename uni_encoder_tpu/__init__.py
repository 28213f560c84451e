"""uni_encoder_tpu — a TPU-native (JAX / XLA / Pallas / pjit) multi-task driving
perception framework.

Capability-equivalent rebuild of HI-ComputerVision/uni-encoder-code (the
"Unified Encoder for Efficient Multi-Task Inference" release): one shared
backbone feeding a task-conditioned mask-classification head (semantic /
instance / panoptic segmentation) and a self-supervised monocular depth +
ego-motion + object-motion stack.

Design notes (TPU-first, not a port):
  * NHWC layouts everywhere; bf16-friendly; static shapes under jit.
  * Compute path: flax.linen modules compiled with jax.jit / pjit over a
    jax.sharding.Mesh; hot irregular ops (multi-scale deformable attention,
    windowed attention) have XLA reference implementations plus Pallas
    kernels.
  * Post-processing (panoptic stitching, instance top-k) is vectorized
    device code with a fixed query budget — no Python loops / host syncs
    (contrast: reference model/oneformer_model.py:399-431).
"""

__version__ = "0.1.0"
