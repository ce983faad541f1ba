from .attention import gat_attention
from .dropout import dropout
from .hoist import hoisting_jit
from .normalize import edge_dropout, normalize_adjacency
from .segment import segment_softmax
from .spmm import (edge_dot, prepare_spmm, sddmm, set_spmm_impl, spmm,
                   spmm_segment)
