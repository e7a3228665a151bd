"""LPI-TPU: a TPU-native continual vision-language framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of Kelvin-ywc/LPI
("Low-rank Prompt Interaction for Continual Vision-Language Retrieval",
ACM MM 2024): continual image-text retrieval (prompted CLIP dual encoder)
and continual referring-expression grounding (prompted GLIP-T), unified
under one framework:

    frozen pretrained dual tower
      + per-layer low-rank prompt injectors (CP-factorized pools)
      + task-indexed parameter pools with a leading [num_tasks] axis
      + cross-modal low-rank interaction modules
      + a continual session driver (freeze masks, task-key inference)

Design stance (TPU-first, not a port):
  * All compute paths are jit-compiled XLA with static shapes.
  * Task pools live as single arrays with a leading task axis; selecting the
    active task is a gather, and "only task t is trainable" is a gradient
    mask — not requires_grad mutation.
  * Batch-global InfoNCE logits are computed with features all-gathered over
    the ICI mesh (`lpi_tpu.losses.clip_loss`).
  * Detection ops that are CUDA kernels in the reference (NMS, deformable
    conv, ROIAlign) are padded static-shape XLA/Pallas formulations
    (`lpi_tpu.ops`).
"""

__version__ = "0.1.0"

from lpi_tpu.core import config as config  # noqa: F401
