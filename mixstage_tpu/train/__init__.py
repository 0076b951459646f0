from mixstage_tpu.train import losses as losses  # noqa: F401
from mixstage_tpu.train import state as state  # noqa: F401
from mixstage_tpu.train import steps as steps  # noqa: F401
