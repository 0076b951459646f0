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


# Extended loss vocabulary of the Disentangle trainer composition (reference
# trainer.py:1437-1446).  Display order of the trainer's running-loss slots:
# slots 0-1 are the G-branch losses (pose, G_gan), slots 2-3 the D-branch
# losses (real_D, fake_D), slots 4+ the generator's partial internal losses
# in emission order (reference calculate_loss, trainer.py:1461-1474: i<2 →
# slot i or i+2 by G_flag; i>=2 → slot i+2).
DISENTANGLE_LOSS_KINDS = ["pose", "G_gan", "real_D", "fake_D", "con_+",
                          "con_-", "id_a", "id_p", "c_a", "c_p", "st_a",
                          "st_p", "rec_a", "rec_p", "H"]

# Canonical names of the internal losses a Disentangle generator emits in its
# ``internal_losses`` output dict, in reference slot order.  These are the
# keys of the ``-style_losses`` weight dict (reference argsUtils.py:45) plus
# the unweighted entropy term 'H'; they map 1:1 onto the abbreviated display
# slots DISENTANGLE_LOSS_KINDS[4:] above (con_+ ↔ content_+, c_a ↔ cluster_a,
# st_a ↔ style_a, …).
DISENTANGLE_INTERNAL_LOSSES = ["content_+", "content_-", "id_a", "id_p",
                               "cluster_a", "cluster_p", "style_a", "style_p",
                               "rec_a", "rec_p", "H"]


def register_model(name: str, cls: Type[nn.Module]) -> None:
    """Register an extension model (e.g. a Disentangle generator).

    The reference selects models with ``eval(args.model)`` (trainer.py:971),
    so any importable class is selectable upstream; this is the explicit
    equivalent.  A model whose name contains 'Disentangle' must follow the
    ``JointLateClusterSoftStyle4_G`` call signature and additionally return
    ``internal_losses``: a dict of scalar losses named after
    ``DISENTANGLE_INTERNAL_LOSSES`` (already weighted by the model's
    ``style_losses`` kwarg, which the trainer forwards from the
    ``-style_losses`` flag exactly like reference trainer.py:1434)."""
    MODEL_REGISTRY[name] = cls


def get_model_def(name: str) -> Type[nn.Module]:
    if name not in MODEL_REGISTRY:
        if "Disentangle" in name:
            raise NotImplementedError(
                f"model {name!r}: the Disentangle trainer composition is "
                "upstream-incomplete — the reference defines "
                "TrainerLateClusterStyleDisentangleGAN with the extended "
                "loss list (reference trainer.py:1419-1474) but ships no "
                "Disentangle generator model (eval(args.model) would "
                "NameError upstream too).  The trainer-side plumbing is "
                "implemented: register_model() a generator emitting the "
                f"internal losses {DISENTANGLE_INTERNAL_LOSSES} to use it.")
        raise KeyError(
            f"model {name!r} not in registry; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]


def infer_discriminator_name(model_name: str) -> str:
    """'<prefix>_G' → '<prefix>_D' (reference trainer.py:1052-1055)."""
    return "_".join(model_name.split("_")[:-1] + ["D"])
