"""LightHand-TPU: a TPU-native (JAX/Flax/Pallas/pjit) hand-pose estimation framework.

A from-scratch rebuild of the capabilities of leejeongho3214/LightHand
(top-down 2D hand-pose estimation: 21-joint Gaussian-heatmap regression with
SimpleBaseline/HRNet backbones, LightHand99K/FreiHAND/RHD/InterHand/GAN
datasets, PCK/EPE/AUC evaluation) designed TPU-first:

- models are jit-compiled Flax modules (NHWC, bf16 compute / f32 params);
- heatmap target generation, keypoint decoding, and all metrics run on-device;
- data parallelism shards batches over a ``jax.sharding.Mesh`` with
  XLA-inserted collectives (no NCCL-style wrappers);
- the per-sample augmentation pipeline (affine crop/rotate + color jitter +
  normalize) is fused on-device (Pallas / vectorized jnp) instead of running
  in CPU DataLoader workers.

Reference layer map: SURVEY.md section 1 (citations into /root/reference).
"""

__version__ = "0.1.0"

from lighthand_tpu import ops  # noqa: F401
