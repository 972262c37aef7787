from findkmer_tpu.parallel.mesh import make_mesh, device_axis
from findkmer_tpu.parallel.dist import DistributedCounter

__all__ = ["make_mesh", "device_axis", "DistributedCounter"]
