"""Model registry — replaces the reference's ``eval(args.model)`` dispatch
(``/root/reference/src/model/trainer.py:971,1049``) with an explicit dict.

``get_model_def(name)`` returns the flax module class; the trainer composes
behaviour from the same model-name substrings the reference's
``trainer_chooser`` uses (trainer_chooser.py:4-26), see
``mixstage_tpu.train.trainer.trainer_capabilities``.
"""

from __future__ import annotations

from typing import Dict, Type

from flax import linen as nn

from mixstage_tpu.models.mix_stage import (JointLateClusterSoftStyle4_D,
                                           JointLateClusterSoftStyle4_G)
from mixstage_tpu.models.speech2gesture import (Speech2Gesture_D,
                                                Speech2Gesture_G)
from mixstage_tpu.models.style_classifier import StyleClassifier_G

MODEL_REGISTRY: Dict[str, Type[nn.Module]] = {
    "Speech2Gesture_G": Speech2Gesture_G,
    "Speech2Gesture_D": Speech2Gesture_D,
    "JointLateClusterSoftStyle4_G": JointLateClusterSoftStyle4_G,
    "JointLateClusterSoftStyle4_D": JointLateClusterSoftStyle4_D,
    "StyleClassifier_G": StyleClassifier_G,
}


def get_model_def(name: str) -> Type[nn.Module]:
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"model {name!r} not in registry; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]


def infer_discriminator_name(model_name: str) -> str:
    """'<prefix>_G' → '<prefix>_D' (reference trainer.py:1052-1055)."""
    return "_".join(model_name.split("_")[:-1] + ["D"])
