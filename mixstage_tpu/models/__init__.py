from mixstage_tpu.models import layers as layers
from mixstage_tpu.models.registry import MODEL_REGISTRY, get_model_def  # noqa: F401
from mixstage_tpu.models.speech2gesture import Speech2Gesture_G, Speech2Gesture_D  # noqa: F401
from mixstage_tpu.models.mix_stage import JointLateClusterSoftStyle4_G  # noqa: F401
from mixstage_tpu.models.style_classifier import StyleClassifier_G  # noqa: F401
