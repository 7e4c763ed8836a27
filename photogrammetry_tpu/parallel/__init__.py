from photogrammetry_tpu.parallel.mesh import make_mesh, track_sharding
from photogrammetry_tpu.parallel.dist_ba import (
    distributed_bundle_adjust, shard_problem,
)
