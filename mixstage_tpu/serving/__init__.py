from mixstage_tpu.serving.client import PoseClient
from mixstage_tpu.serving.server import (DynamicBatcher, PoseService,
                                         start_http_server)

__all__ = ["DynamicBatcher", "PoseClient", "PoseService",
           "start_http_server"]
