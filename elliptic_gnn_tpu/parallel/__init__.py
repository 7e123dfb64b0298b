from .mesh import make_mesh, node_sharding, replicated  # noqa: F401
from .sharded import shard_graph_inputs, pad_to_multiple  # noqa: F401
