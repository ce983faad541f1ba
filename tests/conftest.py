"""Test configuration: force an 8-device virtual CPU mesh.

Multi-host logic is tested without a cluster by simulating 8 XLA CPU devices
(the standard JAX fake-backend trick, SURVEY.md §4c).  The axon/TPU plugin
registers itself via sitecustomize before pytest starts, so the platform is
overridden through jax.config (env vars alone are read too early).
"""
import os

# must be set before the first backend initialization
_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()
os.environ["GNNTF_TPU_ALLOW_SYNTHETIC"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_dataset():
    from gnntf_tpu.data import synthetic_planetoid

    return synthetic_planetoid(n_nodes=200, n_classes=4, n_features=24,
                               avg_degree=6.0, seed=3, train_per_class=10,
                               n_valid=40)


@pytest.fixture(scope="session")
def small_graph(small_dataset):
    import gnntf_tpu as gt

    G = small_dataset[0]
    return gt.graph2adj(G)
