from mixstage_tpu.evaluation.metrics import (FID, PCK, W1, AverageMeter,  # noqa: F401
                                             Diversity, Expressiveness, F1,
                                             InceptionScoreStyle, L1, Stack,
                                             VelL1)
