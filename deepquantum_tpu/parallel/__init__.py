from .sharded import ShardedSimulator, make_mesh
from .circuit import DistributedQubitCircuit
