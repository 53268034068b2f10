from mtn_tpu.parallel import multihost
from mtn_tpu.parallel.mesh import make_mesh
from mtn_tpu.parallel.sharding import Shardings, default_rules

__all__ = ["make_mesh", "Shardings", "default_rules", "multihost"]
