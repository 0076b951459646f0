from mixstage_tpu.serving.server import (DynamicBatcher, PoseService,
                                         start_http_server)

__all__ = ["DynamicBatcher", "PoseService", "start_http_server"]
