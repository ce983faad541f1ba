"""Data-layer golden parity: the rewritten .cites/.content parser and the
split generators must produce byte-identical outputs to the live reference
``experiments/experiment_setup.py`` (VERDICT r1 #7)."""
import importlib.util
import os

import numpy as np
import pytest

REF_SETUP = "/root/reference/experiments/experiment_setup.py"


def _load_ref_setup():
    try:
        spec = importlib.util.spec_from_file_location("ref_setup", REF_SETUP)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:  # pragma: no cover
        return None


ref_setup = _load_ref_setup()
requires_ref = pytest.mark.skipif(ref_setup is None,
                                  reason="reference setup unavailable")

DENSE_CITES = """\
paper:a\tpaper:b
a\tc
malformed
b\tc
c\ta
d\td
e\ta
"""
# node e has no content row -> pruned; node z is unknown -> row ignored
DENSE_CONTENT = """\
a\t1.0\t0.0\t2.5\tlabelA
b\t0.0\t3.0\t0.0\tlabelB
c\t4.0\t0.0\t0.0\tlabelA
z\t9.0\t9.0\t9.0\tlabelC
d\t0.5\t0.5\t0.5\tlabelB
"""

NAMED_CITES = "n1\tn2\nn2\tn3\nn3\tn1\n"
NAMED_CONTENT = (
    "NODE\tskip\tme\n"
    "id:label\tcls\tw:alpha\tw:beta\tw:summary\n"
    "n1\tred\talpha=1.5\tbeta=2\n"
    "n2\tblue\tbeta=4\tsummary=7\textra=9\n"
    "n3\tred\talpha=0.25\n"
)


def _write(tmp_path, name, cites, content):
    d = tmp_path / "data"
    d.mkdir(exist_ok=True)
    (d / f"{name}.cites").write_text(cites)
    (d / f"{name}.content").write_text(content)
    return str(tmp_path)


def _assert_same_load(ours, theirs):
    G, feats, labs = ours
    G_r, feats_r, labs_r = theirs
    assert list(G) == list(G_r)                       # node-order contract
    assert list(G.edges()) == list(G_r.edges())
    assert list(feats) == list(feats_r)
    for k in feats_r:
        assert feats[k] == feats_r[k], k
    assert labs == labs_r


@requires_ref
@pytest.mark.parametrize("name,cites,content", [
    ("dense", DENSE_CITES, DENSE_CONTENT),
    ("named", NAMED_CITES, NAMED_CONTENT),
])
def test_dataload_matches_reference(tmp_path, monkeypatch, name, cites,
                                    content):
    from gnntf_tpu.data.loaders import _dataload

    root = _write(tmp_path, name, cites, content)
    ours = _dataload(name, os.path.join(root, "data"))
    monkeypatch.chdir(root)  # the reference hardcodes the 'data/' prefix
    ref_setup._loaded.clear()
    theirs = ref_setup.load(name)
    _assert_same_load(ours, theirs)


def test_dense_load_shape_and_prune(tmp_path):
    from gnntf_tpu.data.loaders import _dataload

    root = _write(tmp_path, "dense", DENSE_CITES, DENSE_CONTENT)
    G, feats, labs = _dataload("dense", os.path.join(root, "data"))
    # e pruned (no content row); d never enters (self-loop only)
    assert set(G) == {"a", "b", "c"}
    assert "z" not in feats                      # unknown id ignored
    assert feats["a"] == [1.0, 0.0, 2.5]
    assert labs["b"] == "labelB"
    assert list(feats) == list(G)                # node-order re-key


def test_named_format_columns(tmp_path):
    from gnntf_tpu.data.loaders import _dataload

    root = _write(tmp_path, "named", NAMED_CITES, NAMED_CONTENT)
    G, feats, labs = _dataload("named", os.path.join(root, "data"))
    # schema columns: alpha, beta, summary (summary always forced to 0)
    assert feats["n1"] == [1.5, 2.0, 0.0]
    assert feats["n2"] == [0.0, 4.0, 0.0]
    assert feats["n3"] == [0.25, 0.0, 0.0]
    assert labs == {"n1": "red", "n2": "blue", "n3": "red"}


@requires_ref
@pytest.mark.parametrize("seed", [0, 1, 7])
@pytest.mark.parametrize("num_validation", [500, 30, None])
def test_custom_splits_bitwise_parity(seed, num_validation):
    rng = np.random.RandomState(seed)
    labels = rng.randint(-1, 5, size=400)
    ours = __import__("gnntf_tpu.data.loaders",
                      fromlist=["custom_splits"]).custom_splits(
        labels, examples_per_class=12, num_validation=num_validation,
        seed=seed)
    theirs = ref_setup.custom_splits(labels, examples_per_class=12,
                                     num_validation=num_validation,
                                     seed=seed)
    for a, b in zip(ours, theirs):
        assert list(a) == list(b)


@requires_ref
@pytest.mark.parametrize("seed", [0, 3])
def test_random_splits_bitwise_parity(seed):
    labels = np.arange(123)
    from gnntf_tpu.data.loaders import random_splits
    ours = random_splits(labels, 0.55, 0.25, seed=seed)
    theirs = ref_setup.random_splits(labels, 0.55, 0.25, seed=seed)
    for a, b in zip(ours, theirs):
        assert list(a) == list(b)


def test_custom_splits_string_labels():
    """String labels: every node is 'labeled' (nothing equals -1)."""
    from gnntf_tpu.data.loaders import custom_splits
    labels = np.asarray(["x", "y", "x", "z", "y", "x", "z", "z"])
    tr, va, te = custom_splits(labels, examples_per_class=1,
                               num_validation=2, seed=0)
    assert len(tr) == 3
    assert len(va) == 2 and len(te) == 3
    assert not (set(tr) & set(va)) and not (set(va) & set(te))


def test_ingest_selftest(tmp_path):
    """scripts/ingest.py round-trips planetoid raw files and OGB
    npz/csv.gz fixtures into the exact caches the loaders read
    (VERDICT r4 item 8)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gnntf_ingest", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "ingest.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.selftest(str(tmp_path))
