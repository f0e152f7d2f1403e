"""ct_tpu — a TPU-native few-shot detection framework (JAX/XLA/Pallas/pjit).

Re-implements the full capability surface of Ze-Yang/Context-Transformer
(AAAI 2020; RFBNet-SSD + Context-Transformer few-shot head) as a brand-new
TPU-first framework:

- NHWC pure-XLA convolutional backbone (VGG16-reducedfc + RFB blocks).
- Vmapped prior matching / multibox loss (the reference loops per-image in
  Python, ``/root/reference/layers/modules/multibox_loss_combined.py:70-74``).
- Fused Pallas attention kernel for the Context-Transformer head
  (reference materializes a [B, 11620, 1858] affinity matrix,
  ``/root/reference/models/RFB_Net_vgg.py:262-264``).
- Batched fixed-shape box decode + NMS on device (replacing the Cython/CUDA
  extensions in ``/root/reference/utils/nms/``).
- pjit/shard_map data parallelism over a device mesh (replacing
  ``torch.nn.DataParallel``, ``/root/reference/train.py:296-297``).

Subpackages:
  config    — static SSD architecture configs + phase/setting/method task table
  ops       — pure-jnp geometry, matching, losses, NMS, Pallas kernels
  models    — Flax modules: RFBNet-300/512 + Context-Transformer head
  data      — VOC/COCO datasets, shot/split selection, SSD augmentations
  train     — optax solver, train step, checkpointer, event storage, sampler
  parallel  — mesh construction and sharding helpers
  utils     — logging, timers
"""

__version__ = "0.1.0"
