from mixstage_tpu.serving.client import PoseClient, PoseStream
from mixstage_tpu.serving.server import (DynamicBatcher, PoseService,
                                         start_http_server)

__all__ = ["DynamicBatcher", "PoseClient", "PoseService", "PoseStream",
           "start_http_server"]
