"""Interoperability with the PyTorch reference (chahuja/mix-stage).

``torch_import`` converts reference pycasper checkpoints
(``PREFIX_weights.p`` holding a ``model.state_dict()``) into this
framework's parameter trees, so experiments trained with the reference
migrate without retraining.
"""

from mixstage_tpu.interop.torch_import import (  # noqa: F401
    convert_reference_checkpoint, load_torch_state_dict, sniff_torch_file)
