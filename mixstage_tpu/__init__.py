"""mixstage_tpu — a TPU-native (JAX/XLA/Pallas) framework for co-speech gesture
style transfer with the capabilities of Mix-StAGE (ECCV 2020).

Re-designed TPU-first from the PyTorch reference (chahuja/mix-stage):

* models are pure functional flax.linen modules (reference: ``src/model/*.py``),
* training is jitted step functions over explicit train-state pytrees
  (reference: stateful ``src/model/trainer.py``),
* data parallelism is ``jax.sharding`` + ``shard_map`` over a device mesh
  (reference: single-device),
* the hot grouped-conv mixture decoder has a fused Pallas kernel path
  (reference: cuDNN grouped conv).

Public surface mirrors the reference CLI / experiment-file contracts so a user
of the reference can switch over; see docs/PARITY.md.
"""

__version__ = "0.1.0"

from mixstage_tpu import config as config  # noqa: F401
