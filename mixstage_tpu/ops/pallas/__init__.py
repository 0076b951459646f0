from mixstage_tpu.ops.pallas.fused_conv import (fold_bn_into_conv,  # noqa: F401
                                                fused_grouped_conv_chain)
