from .format import BlockedCOO, block_coo
from .spmm import spmm_pallas
