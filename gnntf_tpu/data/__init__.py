from .loaders import (custom_splits, dgl_setup, enrich_features, load,
                      random_splits, sample_edges)
from .synthetic import random_power_law_edges, synthetic_planetoid
