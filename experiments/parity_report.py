"""Generate PARITY_r05.md (regenerated per round): measured training-trajectory + accuracy parity
between this framework and the live TF reference (/root/reference).

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python experiments/parity_report.py

The comparisons mirror tests/test_parity.py's trajectory suite but on a
larger graph / longer horizon and write the measured numbers to a committed
artifact (VERDICT r1 item 1: "a committed PARITY_r05.md artifact ... Done =
test green in CI + artifact with numbers").
"""
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, "/root/reference")
os.environ.setdefault("GNNTF_TPU_ALLOW_SYNTHETIC", "1")

import warnings

warnings.filterwarnings("ignore")

import tensorflow as tf  # noqa: E402
import gnntf as ref  # noqa: E402

import gnntf_tpu as gt  # noqa: E402


def ref_vars(model):
    return model._VariableGenerator__vars


def freeze_reset(model):
    rvars = ref_vars(model)
    snaps = [v.var.numpy().copy() for v in rvars]

    def frozen():
        for v, s in zip(rvars, snaps):
            v.var.assign(s)

    model.reset = frozen
    return snaps


def record_losses(task):
    rec = []
    orig = task.loss

    def wrapped(feats):
        out = orig(feats)
        rec.append(float(out))
        return out

    task.loss = wrapped
    return rec


def trajectory(name, ref_builder, our_builder, G, feats, labels, splits,
               epochs, patience=10_000_000):
    import jax.numpy as jnp

    train_idx, valid_idx, test_idx = splits
    rm = ref_builder(ref.graph2adj(G), tf.constant(feats))
    rm.reset()
    snaps = freeze_reset(rm)
    rv = ref.NodeClassification(valid_idx, labels[valid_idx])
    ref_vl = record_losses(rv)
    t0 = time.perf_counter()
    rm.train(train=ref.NodeClassification(train_idx, labels[train_idx]),
             valid=rv, epochs=epochs, patience=patience)
    ref_s = time.perf_counter() - t0
    ref_final = [v.var.numpy() for v in ref_vars(rm)]
    ref_pred = np.asarray(rm.predict(ref.NodeClassification(test_idx)))
    ref_acc = float(np.mean(ref_pred == labels[test_idx]))

    om = our_builder(gt.graph2adj(G), feats)
    params = {s.name: jnp.asarray(v)
              for s, v in zip(om.param_specs, snaps)}
    t0 = time.perf_counter()
    hist = om.train(train=gt.NodeClassification(train_idx, labels[train_idx]),
                    valid=gt.NodeClassification(valid_idx, labels[valid_idx]),
                    epochs=epochs, patience=patience, init_params=params)
    our_s = time.perf_counter() - t0
    our_pred = np.asarray(om.predict(gt.NodeClassification(test_idx)))
    our_acc = float(np.mean(our_pred == labels[test_idx]))

    vl_ref = np.asarray(ref_vl)
    vl_our = np.asarray(hist["valid_loss"])
    n = min(len(vl_ref), len(vl_our))
    max_abs = float(np.max(np.abs(vl_ref[:n] - vl_our[:n])))
    pmax = 0.0
    for spec, rvv in zip(om.param_specs, ref_final):
        d = float(np.max(np.abs(np.asarray(om.params[spec.name]) - rvv)))
        s = float(np.abs(rvv).max() + 1e-9)
        pmax = max(pmax, d / s)
    return dict(name=name, epochs_ref=len(vl_ref), epochs_ours=len(vl_our),
                vl_max_abs=max_abs, param_max_rel=pmax,
                ref_acc=ref_acc, our_acc=our_acc,
                pred_agree=float(np.mean(ref_pred == our_pred)),
                ref_s=ref_s, our_s=our_s)


def main():
    from gnntf_tpu.data import synthetic_planetoid

    G, labels, feats, train_idx, valid_idx, test_idx = synthetic_planetoid(
        n_nodes=600, n_classes=5, n_features=48, avg_degree=7.0, seed=9,
        train_per_class=15, n_valid=120)
    splits = (train_idx, valid_idx, test_idx)

    rows = []
    rows.append(trajectory(
        "GCNII (dropout=0, 8 iters, 40 epochs)",
        lambda a, f: ref.GCNII(a, f, num_classes=5, iterations=8,
                               latent_dims=[16], dropout=0),
        lambda a, f: gt.GCNII(a, f, num_classes=5, iterations=8,
                              latent_dims=(16,), dropout=0),
        G, feats, labels, splits, epochs=40))

    from gnntf.core.gnn.architectures.filter import PPRIteration as RefPPR
    from gnntf.core.nn import Dense as RefDense
    import jax

    def ref_appnp_det(adj, f):
        m = ref.GNN(adj, f)
        m.add(RefDense(32, activation=tf.nn.relu))
        H0 = m.add(RefDense(5, regularize=False))
        for _ in range(10):
            m.add(RefPPR(H0, 0.1, graph_dropout=0))
        return m

    def our_appnp_det(adj, f):
        m = gt.GNN(adj, f)
        m.add(gt.Dense(32, activation=jax.nn.relu))
        H0 = m.add(gt.Dense(5, regularize=False))
        for _ in range(10):
            m.add(gt.PPRIteration(H0, 0.1, graph_dropout=0.0))
        return m

    rows.append(trajectory(
        "APPNP-det (10-step PPR, dropout off, 40 epochs)",
        ref_appnp_det, our_appnp_det, G, feats, labels, splits, epochs=40))

    rows.append(trajectory(
        "GCNII early-stop (patience=10, cap 400)",
        lambda a, f: ref.GCNII(a, f, num_classes=5, iterations=8,
                               latent_dims=[16], dropout=0),
        lambda a, f: gt.GCNII(a, f, num_classes=5, iterations=8,
                              latent_dims=(16,), dropout=0),
        G, feats, labels, splits, epochs=400, patience=10))

    # stochastic: full-default APPNP (dropout 0.6 / graph_dropout 0.5).
    # 20 seeded repeats + bootstrap CI — the reference's own experiment
    # methodology (test_experiments.py:8-22), applied to the parity
    # question (VERDICT r4 item 5: the r4 5-seed -0.35% mean gap was
    # never CI-certified as noise).
    reps = int(os.environ.get("GNNTF_PARITY_REPS", "20"))
    ref_accs, our_accs = [], []
    for rep in range(reps):
        ref.measures.set_seed(rep)
        rm = ref.APPNP(ref.graph2adj(G), tf.constant(feats), num_classes=5)
        rm.train(train=ref.NodeClassification(train_idx, labels[train_idx]),
                 valid=ref.NodeClassification(valid_idx, labels[valid_idx]),
                 epochs=150, patience=30)
        p = np.asarray(rm.predict(ref.NodeClassification(test_idx)))
        ref_accs.append(float(np.mean(p == labels[test_idx])))
        gt.set_seed(rep)
        om = gt.APPNP(gt.graph2adj(G), feats, num_classes=5)
        om.train(train=gt.NodeClassification(train_idx, labels[train_idx]),
                 valid=gt.NodeClassification(valid_idx, labels[valid_idx]),
                 epochs=150, patience=30)
        p = np.asarray(om.predict(gt.NodeClassification(test_idx)))
        our_accs.append(float(np.mean(p == labels[test_idx])))

    lines = []
    lines.append("# PARITY_r05 — measured training parity vs the TF reference")
    lines.append("")
    lines.append("Generated by `experiments/parity_report.py` (CPU backend, "
                 "reference imported live from `/root/reference`).")
    lines.append("Graph: synthetic planetoid, 600 nodes / 5 classes / 48 "
                 "features, identical for both frameworks; parameters "
                 "initialized by the *reference's* `reset()` and copied "
                 "into our param pytree before training.")
    lines.append("")
    lines.append("## Deterministic training-trajectory parity (dropout off)")
    lines.append("")
    lines.append("| case | epochs (ref/ours) | max |Δvalid-loss| | "
                 "max rel |Δbest-params| | test acc (ref vs ours) | "
                 "pred agreement | wall s (ref -> ours) |")
    lines.append("|---|---|---|---|---|---|---|")
    for r in rows:
        lines.append(
            f"| {r['name']} | {r['epochs_ref']}/{r['epochs_ours']} "
            f"| {r['vl_max_abs']:.2e} | {r['param_max_rel']:.2e} "
            f"| {r['ref_acc']:.4f} vs {r['our_acc']:.4f} "
            f"| {r['pred_agree']:.4f} "
            f"| {r['ref_s']:.1f}s -> {r['our_s']:.1f}s |")
    lines.append("")
    lines.append("Per-epoch validation losses are recorded by wrapping the "
                 "reference valid predictor's `loss` (called once per epoch "
                 "at trainable.py:83-84); best-params are compared after "
                 "both trainers restore their best-validation snapshot.")
    lines.append("")
    lines.append("## Stochastic accuracy parity (full default dropout)")
    lines.append("")
    lines.append(f"APPNP defaults (dropout 0.6, graph_dropout 0.5), "
                 f"{reps} seeded repeats, 150-epoch cap / patience 30:")
    lines.append("")
    ref_ci = gt.measures.bootstrap_ci(ref_accs)
    our_ci = gt.measures.bootstrap_ci(our_accs)
    diff_ci = gt.measures.bootstrap_ci(
        np.asarray(our_accs) - np.asarray(ref_accs))
    overlap = not (ref_ci[1] > our_ci[2] or our_ci[1] > ref_ci[2])
    diff_zero = diff_ci[1] <= 0.0 <= diff_ci[2]
    lines.append(f"- reference accuracies: "
                 f"{[round(a, 4) for a in ref_accs]}")
    lines.append(f"- ours accuracies:      "
                 f"{[round(a, 4) for a in our_accs]}")
    lines.append(f"- reference mean {ref_ci[0]:.4f}, bootstrap 95% CI "
                 f"[{ref_ci[1]:.4f}, {ref_ci[2]:.4f}]")
    lines.append(f"- ours mean {our_ci[0]:.4f}, bootstrap 95% CI "
                 f"[{our_ci[1]:.4f}, {our_ci[2]:.4f}]")
    lines.append(f"- paired per-seed difference (ours - ref): mean "
                 f"{diff_ci[0]:+.4f}, 95% CI [{diff_ci[1]:+.4f}, "
                 f"{diff_ci[2]:+.4f}]")
    lines.append(f"- CIs {'OVERLAP' if overlap else 'SEPARATE'}; paired "
                 f"difference CI {'contains' if diff_zero else 'excludes'} "
                 f"zero -> the stochastic gap "
                 f"{'is statistically indistinguishable from noise' if (overlap and diff_zero) else 'needs investigation'} "
                 f"at {reps} repeats (the reference methodology, "
                 f"test_experiments.py:8-22; measures.bootstrap_ci)")
    lines.append("")
    lines.append("CI equivalents: `tests/test_parity.py` — "
                 "`test_training_trajectory_parity_gcnii`, "
                 "`test_training_trajectory_parity_appnp_propagation`, "
                 "`test_training_early_stopping_parity`, "
                 "`test_training_accuracy_parity_with_dropout`.")
    lines.append("")
    out = "\n".join(lines) + "\n"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY_r05.md")
    with open(path, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
