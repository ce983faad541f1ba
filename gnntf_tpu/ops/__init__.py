from .dropout import dropout
from .normalize import edge_dropout, normalize_adjacency
from .segment import segment_softmax
from .spmm import (edge_dot, prepare_spmm, sddmm, set_spmm_impl, spmm,
                   spmm_segment)
