from .dist import (EDGE_AXIS, FEAT_AXIS, graph_shardings, make_distributed_eval,
                   make_distributed_train_step, make_mesh, param_shardings,
                   place_state, shard_graph)
from .partition import pad_graph
from .halo import (HaloExecutor, HaloPartition, build_halo_partition,
                   halo_spmm)
from .hier_halo import (HierHaloPartition, build_hier_halo_partition,
                        hier_halo_spmm)
from .multihost import (EDGE_HOST_AXIS, launch_distributed, make_pod_mesh,
                        shard_graph_local)
from .ring import RingPartition, build_ring_partition, ring_spmm
