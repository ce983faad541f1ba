"""gnntf_tpu — a TPU-native graph neural network framework.

Brand-new JAX/XLA/Pallas implementation providing the capabilities of the
`gnntf` reference library (MKLab-ITI/gnn-tf) in a TPU-first design.  The
public API is flat, mirroring the reference's star-exports
(reference gnntf/__init__.py:1-2).
"""
from . import measures
from .graph import (Graph, add_self_loops, adj2graph, create_nx_graph,
                    from_edges, graph2adj, graph2indices)
from .measures import acc, auc, avprec, f1, prec, rec, set_seed
from .models import (APPNP, APPNP2, GAT, GCN, GCNII, GIN, MLP, NGCF,
                     APPNPReg, APPNPThrough, FastReg, GATLayer, GCNIILayer,
                     GCNIISpectralPreservingLayer, GCNIIReg, GCNLayer,
                     GCNSpectralPreservingLayer, GINLayer, GNN, GraphSAGE,
                     NGCFLayer, PPRIteration, PPRSweep, SAGELayer,
                     StableIteration, Structural)
from .nn import (LSTM, Activation, Branch, Concatenate, Dense, Dropout,
                 Forward, Layer, Network, Resume, Tradeoff, Wrap, batches)
from .ops import (dropout, edge_dot, normalize_adjacency, sddmm,
                  segment_softmax, set_spmm_impl, spmm)
from .tasks import (LinkPrediction, MeanLinkPrediction, NodeClassification,
                    Predictor, negative_sampling, recommend_all)
from .train import Trainable, fit, keras_adam

# drop-in aliases for reference class names (layered.py / variables.py):
# the builder Network plays both roles in the functional design
Layered = Network
VariableGenerator = Network
Trainable = Trainable  # noqa: PLW0127 — re-exported from .train
metrics = measures  # the reference exposes its measures module as `metrics`

__version__ = "0.1.0"
