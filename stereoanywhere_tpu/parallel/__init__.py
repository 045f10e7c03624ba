from stereoanywhere_tpu.parallel.mesh import make_mesh  # noqa: F401
from stereoanywhere_tpu.parallel.halo import halo_exchange  # noqa: F401
from stereoanywhere_tpu.parallel.tiles import TileParallelInference  # noqa: F401
from stereoanywhere_tpu.parallel.spatial import RowShardedInference  # noqa: F401
