from mixstage_tpu.parallel.mesh import (make_mesh, replicate_state,  # noqa: F401
                                        shard_batch)
from mixstage_tpu.parallel.parallel import get_parallel_list, parallel  # noqa: F401
