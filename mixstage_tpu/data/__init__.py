from mixstage_tpu.data.hdf5 import HDF5  # noqa: F401
from mixstage_tpu.data.common import Modality, MissingData, SPEAKERS  # noqa: F401
from mixstage_tpu.data.transforms import (Compose, KMeansTransform, RemoveJoints,  # noqa: F401
                                          Relative2Parent, ZNorm)
from mixstage_tpu.data.dataset import Data, MiniData, DataLoader  # noqa: F401
