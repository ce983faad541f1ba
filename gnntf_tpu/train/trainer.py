"""Training runtime (reference: gnntf/core/nn/trainable.py).

Reproduced semantics of ``Trainable.train`` (trainable.py:41-103):
  * fresh parameter init at the start of every ``train()`` call (:53);
  * default optimizer Adam(lr) with Keras epsilon placement (:56-57);
  * ``valid = train`` when no validation task is given (:58-59);
  * per epoch, ``batches`` x {forward with dropout, task loss
    + per-layer output-regularization losses + global
    regularization * per-var-weight * l2(var), gradients of
    loss * degradation(epoch), optimizer update} (:68-79);
  * then a *clean* (dropout-off) full forward for the validation loss (:83);
  * early stopping on validation loss with a patience counter, snapshotting
    parameters at every strict improvement and restoring the best snapshot
    at the end (:90-102) — train() returns the best-validation params, not
    the last.

TPU-native architecture: the epoch body is a single jitted ``train_step``
(forward+backward+update fused by XLA) and the validation forward a jitted
``eval_step``; only the data-dependent patience logic runs on host.  Because
JAX arrays are immutable, the best-weights "snapshot" is just holding a
reference to the params pytree — no copy (the reference must materialize
``var.identity()`` copies, trainable.py:97).

For dispatch-bound small graphs, ``block_epochs > 1`` fuses that many epochs
into one on-device ``lax.scan`` including validation-loss evaluation and
on-device best-params tracking, cutting host<->device round-trips by that
factor while preserving exact early-stopping semantics (patience checks
happen on block boundaries with per-epoch resolution, see ``fit``).
"""
from __future__ import annotations

import math
import time
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import measures
from ..nn.core import Network, Params
from ..ops.hoist import hoisting_jit
from ..tasks.base import Predictor


class KerasAdamState(NamedTuple):
    count: jax.Array
    m: optax.Updates
    v: optax.Updates


def keras_adam(learning_rate: float = 0.01, b1: float = 0.9,
               b2: float = 0.999,
               eps: float = 1e-7) -> optax.GradientTransformation:
    """Adam with Keras' exact update rule (the reference uses
    ``tf.keras.optimizers.Adam(lr)``, trainable.py:56-57):

        alpha = lr * sqrt(1 - b2^t) / (1 - b1^t)
        var  -= alpha * m / (sqrt(v) + eps)

    Note the epsilon placement: added to the *uncorrected* sqrt(v), outside
    the bias-correction factor — ``optax.adam`` instead adds eps to
    sqrt(v_hat), an O(eps * (1 - sqrt(1-b2^t))) divergence per step that is
    visible in training-trajectory parity tests, so the rule is implemented
    verbatim here."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return KerasAdamState(jnp.zeros([], jnp.int32), zeros(), zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        m = jax.tree_util.tree_map(lambda m_, g: b1 * m_ + (1.0 - b1) * g,
                                   state.m, updates)
        v = jax.tree_util.tree_map(
            lambda v_, g: b2 * v_ + (1.0 - b2) * jnp.square(g),
            state.v, updates)
        t = count.astype(jnp.float32)
        alpha = learning_rate * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        out = jax.tree_util.tree_map(
            lambda m_, v_: -alpha * m_ / (jnp.sqrt(v_) + eps), m, v)
        return out, KerasAdamState(count, m, v)

    return optax.GradientTransformation(init_fn, update_fn)


class Trainable(Network):
    """A network bound to one feature matrix at construction
    (reference trainable.py:17-20: "the architecture is defined for specific
    input data") with task-driven train/predict/evaluate."""

    def __init__(self, features):
        features = jnp.asarray(features)
        super().__init__(features.shape)
        self.features = features
        self.params: Optional[Params] = None
        self._act_cache = None  # clean-forward cache (trainable.py:26-39)
        self._eval_fn = None    # jitted clean forward, built once

    # -- inference ----------------------------------------------------------
    def reset(self, seed: Optional[int] = None) -> None:
        self.params = self.init(measures.next_seed() if seed is None else seed)
        self._act_cache = None

    def _activations(self):
        if self.params is None:
            self.reset()
        if self._act_cache is None:
            if self._eval_fn is None:  # build once — jit caches by identity
                # hoisting_jit: layout grids/prepared state enter as
                # parameters, not constants (ops/hoist.py)
                self._eval_fn = hoisting_jit(
                    lambda p, x: self.apply(p, x, training=False))
            self._act_cache = self._eval_fn(self.params, self.features)
        return self._act_cache

    def predict(self, predictor: Predictor):
        predictor.refresh()
        return predictor.predict(self._activations(), predictor.batch(),
                                 params=self.params)

    def loss(self, predictor: Predictor):
        predictor.refresh()
        return predictor.loss(self._activations(), predictor.batch(),
                              params=self.params)

    def evaluate(self, predictor: Predictor):
        predictor.refresh()
        return predictor.evaluate(self._activations(), predictor.batch(),
                                  params=self.params)

    # -- training -----------------------------------------------------------
    def train(self, train: Predictor, valid: Optional[Predictor] = None,
              test: Optional[Predictor] = None, patience: int = 100,
              learning_rate: float = 0.01, regularization: float = 5.0e-4,
              verbose: bool = False, epochs: int = 2000,
              degradation: Callable[[int], float] = lambda epoch: 1,
              batches: int = 1, optimizer=None, seed: Optional[int] = None,
              block_epochs: int = 1, callbacks=(),
              checkpoint_dir: Optional[str] = None,
              checkpoint_every: int = 25, resume: bool = False, mesh=None,
              spmm: Optional[str] = None, spmm_impl: Optional[str] = None,
              init_params=None, remat: bool = False):
        return fit(self, train, valid=valid, test=test, patience=patience,
                   learning_rate=learning_rate, regularization=regularization,
                   verbose=verbose, epochs=epochs, degradation=degradation,
                   batches=batches, optimizer=optimizer, seed=seed,
                   block_epochs=block_epochs, callbacks=callbacks,
                   checkpoint_dir=checkpoint_dir,
                   checkpoint_every=checkpoint_every, resume=resume,
                   mesh=mesh, spmm=spmm, spmm_impl=spmm_impl,
                   init_params=init_params, remat=remat)


def _total_loss(model: Trainable, task: Predictor, params: Params, features,
                rng, batch, regularization: float, remat: bool = False):
    out, fw = model.apply(params, features, rng=rng, training=True,
                          return_ctx=True, remat=remat)
    loss = task.loss(out, batch, params=params)
    loss = loss + model.layer_losses(fw)
    loss = loss + regularization * model.weight_l2(params)
    return loss


def fit(model: Trainable, train: Predictor, valid: Optional[Predictor] = None,
        test: Optional[Predictor] = None, patience: int = 100,
        learning_rate: float = 0.01, regularization: float = 5.0e-4,
        verbose: bool = False, epochs: int = 2000,
        degradation: Callable[[int], float] = lambda epoch: 1,
        batches: int = 1, optimizer=None, seed: Optional[int] = None,
        block_epochs: int = 1, callbacks=(),
        checkpoint_dir: Optional[str] = None, checkpoint_every: int = 25,
        resume: bool = False, mesh=None, spmm: Optional[str] = None,
        spmm_impl: Optional[str] = None, init_params=None,
        remat: bool = False):
    """Train ``model`` in place; leaves best-validation params on
    ``model.params`` and returns a history dict.

    ``remat=True`` checkpoints each layer in the training forward
    (backward recomputes layer internals instead of storing them) —
    required for deep stacks like GCNII-64 at large graph scale.

    With ``checkpoint_dir`` the full early-stopping state (params,
    optimizer state, best params, epoch/patience/best-loss) is persisted
    every ``checkpoint_every`` epochs; ``resume=True`` continues from the
    latest checkpoint with identical semantics (SURVEY §5.3-5.4 — the
    reference keeps this state only in memory, trainable.py:61,97).

    With ``mesh`` (a ``jax.sharding.Mesh`` from ``parallel.make_mesh``)
    every train/eval step runs distributed: the graph edge-sharded, hidden
    weights feature-sharded, gradients synced by GSPMD collectives —
    early-stopping/patience/checkpoint semantics identical to the local
    path.  ``spmm`` selects the distributed propagation executor:
    ``None``/"gspmd" (edge-sharded arrays, XLA-inserted collectives),
    "halo" (explicit shard_map halo-exchange all_to_all, SURVEY §5.7) or
    "ring" (feature blocks rotated with ppermute, ring-attention style).

    ``spmm_impl`` selects the single-chip SpMM formulation
    (``segment``/``ell``/``hybrid``/``pallas``/``auto``) for this call
    only — contextvar-scoped, so concurrent ``fit`` calls on different
    threads cannot cross-talk (unlike the process-global
    ``ops.spmm.set_spmm_impl``).

    ``init_params`` injects a specific initial parameter pytree instead of
    a fresh ``reset(seed)`` — used for warm starts and for golden
    training-trajectory parity against the TF reference (copied init)."""
    if init_params is not None:
        model.params = init_params
        model._act_cache = None
    else:
        model.reset(seed)
    params = model.params
    tx = optimizer if optimizer is not None else keras_adam(learning_rate)
    if valid is None:
        valid = train  # trainable.py:58-59

    trainable = {s.name: s.trainable for s in model.param_specs}

    if spmm not in (None, "gspmd", "halo", "ring"):
        raise ValueError(f"spmm executor must be None, 'gspmd', 'halo' or "
                         f"'ring', got {spmm!r}")
    if mesh is not None and spmm not in ("halo", "ring"):
        from ..parallel import (make_distributed_eval,
                                make_distributed_train_step, place_state,
                                shard_graph)
        from ..parallel.dist import make_eval_raw, make_train_step_raw
        sharded = shard_graph(model.graph, mesh)
        params, features_rep = place_state(model, mesh, params)
        opt_state = tx.init(params)
        dist_step = make_distributed_train_step(
            model, train, mesh, tx, sharded, regularization=regularization)
        dist_eval = make_distributed_eval(model, mesh, sharded)

        def train_step(params, opt_state, rng, deg, batch):
            return dist_step(params, opt_state, rng, deg, features_rep,
                             sharded, batch)

        def eval_acts(params):
            return dist_eval(params, features_rep, sharded)

        # unjitted bodies for the fused multi-epoch scan.  The sharded
        # graph + replicated features are threaded through as EXPLICIT
        # jit arguments (``fused_env``), not closures: a closed-over
        # concrete graph would engage the lazy counter-based dropout path
        # (different realization than the per-epoch GSPMD step's traced
        # bernoulli draw) and silently un-shard the edge arrays into
        # replicated layout constants.  As traced arguments they keep the
        # per-epoch step's exact semantics and GSPMD placements.
        _raw_step = make_train_step_raw(model, train, tx,
                                        regularization=regularization)
        _raw_eval = make_eval_raw(model)

        def train_step_raw(params, opt_state, rng, deg, batch, env):
            features, graph = env
            return _raw_step(params, opt_state, rng, deg, features,
                             graph, batch)

        def eval_acts_raw(params, env):
            features, graph = env
            return _raw_eval(params, features, graph)

        train_step_raw.fused_env = (features_rep, sharded)
        eval_acts_raw.fused_env = (features_rep, sharded)
    else:
        opt_state = tx.init(params)

        def train_step_raw(params, opt_state, rng, deg, batch):
            loss, grads = jax.value_and_grad(
                lambda p: _total_loss(model, train, p, model.features, rng,
                                      batch, regularization,
                                      remat=remat))(params)
            # gradient of loss * degradation(epoch) (trainable.py:78); frozen
            # params receive identically-zero gradients so their Adam moments
            # stay zero and they never move (reference trains only the
            # trainable var list, layered.py:37-39)
            grads = {k: (g * deg if trainable.get(k, True)
                         else jnp.zeros_like(g))
                     for k, g in grads.items()}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_acts_raw(params):
            return model.apply(params, model.features, training=False)

        # hoisting_jit, not jax.jit: the SpMM layout grids, prepared value
        # routing and the feature matrix all enter the program as
        # *parameters* — jax 0.9 inlines closed-over arrays as HLO
        # literals, which at ogbn scale made the train-step program tens
        # of MB and its (remote) compile nondeterministically exceed the
        # bench budget (round-3 root cause, ops/hoist.py)
        train_step = hoisting_jit(train_step_raw)
        eval_acts = hoisting_jit(eval_acts_raw)

        if mesh is not None:  # spmm == "halo" | "ring"
            # same closures (model closes over the concrete graph), but every
            # ops.spmm call inside the trace routes through the explicit
            # shard_map executor on the given mesh.  The override only needs
            # to be live while jit traces, so each call scopes it
            # (post-compile this is a cheap contextvar toggle).
            from ..ops.spmm import spmm_executor
            if spmm == "ring":
                from ..parallel.ring import RingExecutor
                executor = RingExecutor(mesh)
            else:
                from ..parallel.halo import HaloExecutor
                executor = HaloExecutor(mesh)

            def _scoped(fn):
                def wrapped(*args, **kw):
                    with spmm_executor(executor):
                        return fn(*args, **kw)
                wrapped.__dict__.update(fn.__dict__)
                return wrapped

            train_step = _scoped(train_step)
            eval_acts = _scoped(eval_acts)
            # the fused path traces the raw bodies inside its own block
            # program — the executor scope must be live during THAT trace
            train_step_raw = _scoped(train_step_raw)
            eval_acts_raw = _scoped(eval_acts_raw)

    if spmm_impl is not None:
        # per-call formulation selection, contextvar-scoped around each
        # step invocation (only tracing actually consults it)
        from ..ops.spmm import spmm_impl as _impl_scope, _IMPL_NAMES
        if spmm_impl not in _IMPL_NAMES:
            raise ValueError(f"spmm_impl must be one of {_IMPL_NAMES}, "
                             f"got {spmm_impl!r}")

        def _impl_scoped(fn):
            def wrapped(*args, **kw):
                with _impl_scope(spmm_impl):
                    return fn(*args, **kw)
            wrapped.__dict__.update(fn.__dict__)  # keep fused_env marker
            return wrapped

        train_step = _impl_scoped(train_step)
        eval_acts = _impl_scoped(eval_acts)
        # the fused path re-traces the raw fns inside its own block
        # program — the impl scope must be live during THAT trace too
        train_step_raw = _impl_scoped(train_step_raw)
        eval_acts_raw = _impl_scoped(eval_acts_raw)

    valid_loss_fn = jax.jit(
        lambda acts, batch, params: valid.loss(acts, batch, params=params))

    rng_seed = measures.next_seed() if seed is None else seed + 1

    min_loss = float("inf")
    best_params = params  # immutable pytree — snapshot is a reference
    patience_remaining = patience
    history = {"train_loss": [], "valid_loss": [], "epochs_run": 0,
               "best_epoch": -1}

    start_epoch = 0
    if checkpoint_dir and resume:
        from ..utils.checkpoint import restore_checkpoint
        restored = restore_checkpoint(checkpoint_dir,
                                      params_template=params,
                                      opt_template=opt_state)
        if restored is not None:
            step, state = restored
            params = state["params"]
            if state["opt_state"] is not None:
                opt_state = state["opt_state"]
            if state["best_params"] is not None:
                best_params = state["best_params"]
            meta = state["meta"]
            start_epoch = int(meta.get("epoch", step)) + 1
            min_loss = float(meta.get("min_loss", min_loss))
            patience_remaining = int(meta.get("patience_remaining", patience))
            history["best_epoch"] = int(meta.get("best_epoch", -1))
            # restore the RNG stream so a resumed seed=None run draws the
            # exact dropout sequence of the uninterrupted one
            rng_seed = int(meta.get("rng_seed", rng_seed))

    base_rng = jax.random.PRNGKey(rng_seed)

    def save_ckpt(epoch):
        from ..utils.checkpoint import save_checkpoint
        save_checkpoint(
            checkpoint_dir, epoch, params=params, opt_state=opt_state,
            best_params=best_params,
            meta={"epoch": epoch, "min_loss": min_loss,
                  "patience_remaining": patience_remaining,
                  "best_epoch": history["best_epoch"],
                  "rng_seed": rng_seed})

    # Fused multi-epoch scan: local AND distributed (r5 — the GSPMD step
    # is shape-static, and halo/ring executors shard_map inside the scan;
    # previously `mesh is None` was required, so multi-chip training paid
    # per-epoch host dispatch that single-chip no longer did).  Sampled
    # tasks with static shapes (negative-sampling link prediction) fuse
    # too on the local path: the block's batches are pre-drawn on host
    # and scanned over (Predictor.stack_batches).
    train_stackable = (not train.static and mesh is None
                       and getattr(train, "supports_stacking", False))
    use_fused = (block_epochs > 1 and batches == 1 and not verbose
                 and (train.static or train_stackable) and valid.static)
    if use_fused:
        return _fit_fused(
            model, train, valid, train_step_raw, eval_acts_raw, params,
            opt_state,
            base_rng, patience=patience, epochs=epochs,
            degradation=degradation, block_epochs=block_epochs,
            callbacks=callbacks, checkpoint_dir=checkpoint_dir,
            checkpoint_every=checkpoint_every, start_epoch=start_epoch,
            min_loss=min_loss, patience_remaining=patience_remaining,
            best_params=best_params, history=history, rng_seed=rng_seed)

    stop = False
    epoch = start_epoch
    while epoch < epochs and not stop:
        epoch_loss = 0.0
        deg = jnp.asarray(float(degradation(epoch)), jnp.float32)
        for b in range(batches):
            train.refresh()
            batch = train.batch()
            step_rng = jax.random.fold_in(base_rng, epoch * batches + b)
            params, opt_state, loss = train_step(params, opt_state, step_rng,
                                                 deg, batch)
            epoch_loss += float(loss)

        # clean validation forward (dropout off) — trainable.py:83
        acts = eval_acts(params)
        valid.refresh()
        valid_loss = float(valid_loss_fn(acts, valid.batch(), params))

        patience_remaining -= 1
        improved = valid_loss < min_loss  # strict improvement (:96)
        if verbose and improved:
            train_acc = float(train.evaluate(acts, train.batch(), params))
            valid_acc = float(valid.evaluate(acts, valid.batch(), params))
            test_acc = float("nan") if test is None else float(
                test.evaluate(acts, test.batch(), params))
            print(f"\rEpoch {epoch}  patience {patience_remaining}  "
                  f"Train loss {epoch_loss:.3f} Validation loss "
                  f"{valid_loss:.3f}  Train {train_acc:.3f} Validation "
                  f"{valid_acc:.3f}  Test {test_acc:.3f}", end="")
        if improved:
            min_loss = valid_loss
            best_params = params
            patience_remaining = patience
            history["best_epoch"] = epoch
        history["train_loss"].append(epoch_loss)
        history["valid_loss"].append(valid_loss)
        for cb in callbacks:
            stop = bool(cb(epoch=epoch, params=params, valid_loss=valid_loss,
                           best_loss=min_loss,
                           patience_remaining=patience_remaining)) or stop
        if checkpoint_dir and checkpoint_every and \
                (epoch + 1) % checkpoint_every == 0:
            save_ckpt(epoch)
        if patience_remaining == 0:
            break
        epoch += 1

    if checkpoint_dir:
        save_ckpt(min(epoch, epochs - 1))
    model.params = best_params  # restore best snapshot (trainable.py:101-102)
    model._act_cache = None
    history["epochs_run"] = epoch + 1
    if verbose:
        print("\r")
    return history


def _tree_where(cond, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(cond, x, y), a, b)


def _fit_fused(model, train, valid, train_step, eval_acts, params, opt_state,
               base_rng, *, patience, epochs, degradation, block_epochs,
               callbacks, checkpoint_dir, checkpoint_every, start_epoch,
               min_loss, patience_remaining, best_params, history, rng_seed):
    """Fused multi-epoch path: ``block_epochs`` full epochs (train step +
    clean validation + best-params/patience tracking) run inside ONE jitted
    ``lax.scan`` — identical early-stopping semantics to the host loop
    (a ``stopped`` flag gates all state updates past the patience
    exhaustion point, so trailing epochs of the final block cannot leak
    into the result), at 1/block_epochs the dispatch cost.  Static-batch
    tasks close over one batch; sampled tasks with static shapes
    (``supports_stacking``) pre-draw the block's batches on host and scan
    over the stack — one upload per block instead of per epoch.  Verbose
    mode takes the host loop."""
    stacked = not train.static
    if not stacked:
        train.refresh()
        tb = train.batch()
    else:
        tb = None
    valid.refresh()
    vb = valid.batch()

    valid_loss_fn = lambda acts, params: valid.loss(acts, vb, params=params)

    # distributed (GSPMD) steps take the sharded graph + replicated
    # features as an explicit traced argument so the fused program keeps
    # the per-epoch step's exact semantics and shardings (see fit)
    fused_env = getattr(train_step, "fused_env", None)

    @hoisting_jit
    def run_block(params, opt_state, best_params, min_loss, patience_rem,
                  stopped, rngs, degs, *extra):
        if stacked:
            batch_stack, env = extra[0], (extra[1:] or None)
        else:
            batch_stack, env = None, (extra if fused_env is not None
                                      else None)

        def body(carry, inp):
            params, opt_state, best_params, min_loss, patience_rem, stopped \
                = carry
            if stacked:
                rng, deg, tb_e = inp
            else:
                rng, deg = inp
                tb_e = tb
            if env is not None:
                new_params, new_opt, loss = train_step(params, opt_state,
                                                       rng, deg, tb_e, env)
                acts_of = lambda p: eval_acts(p, env)
            else:
                new_params, new_opt, loss = train_step(params, opt_state,
                                                       rng, deg, tb_e)
                acts_of = eval_acts
            params = _tree_where(stopped, params, new_params)
            opt_state = _tree_where(stopped, opt_state, new_opt)
            acts = acts_of(params)
            vloss = valid_loss_fn(acts, params)
            pat = jnp.where(stopped, patience_rem, patience_rem - 1)
            improved = jnp.logical_and(vloss < min_loss,
                                       jnp.logical_not(stopped))
            best_params = _tree_where(improved, params, best_params)
            min_loss = jnp.where(improved, vloss, min_loss)
            pat = jnp.where(improved, patience, pat)
            stopped = jnp.logical_or(stopped, pat <= 0)
            return (params, opt_state, best_params, min_loss, pat,
                    stopped), (loss, vloss, improved)

        carry = (params, opt_state, best_params, min_loss, patience_rem,
                 stopped)
        xs = (rngs, degs, batch_stack) if stacked else (rngs, degs)
        carry, outs = jax.lax.scan(body, carry, xs)
        return carry, outs

    min_loss = jnp.asarray(min_loss, jnp.float32)
    patience_rem = jnp.asarray(patience_remaining, jnp.int32)
    stopped = jnp.asarray(False)
    epoch = start_epoch
    while epoch < epochs:
        n = min(block_epochs, epochs - epoch)
        rngs = jnp.stack([jax.random.fold_in(base_rng, e)
                          for e in range(epoch, epoch + n)])
        degs = jnp.asarray([float(degradation(e))
                            for e in range(epoch, epoch + n)], jnp.float32)
        best_before_block = float(min_loss)
        extra = fused_env if fused_env is not None else ()
        if stacked:
            extra = (train.stack_batches(n),) + extra
        (params, opt_state, best_params, min_loss, patience_rem, stopped), \
            (losses, vlosses, improveds) = run_block(
                params, opt_state, best_params, min_loss, patience_rem,
                stopped, rngs, degs, *extra)
        losses = np.asarray(losses)
        vlosses = np.asarray(vlosses)
        improveds = np.asarray(improveds)
        history["train_loss"].extend(losses.tolist())
        history["valid_loss"].extend(vlosses.tolist())
        for i in range(n):
            if improveds[i]:
                history["best_epoch"] = epoch + i
        if callbacks:
            running_best = np.minimum.accumulate(
                np.minimum(vlosses, best_before_block))
            for cb in callbacks:
                for i in range(n):
                    cb(epoch=epoch + i, params=params,
                       valid_loss=float(vlosses[i]),
                       best_loss=float(running_best[i]),
                       patience_remaining=-1)
        epoch += n
        if checkpoint_dir and checkpoint_every:
            from ..utils.checkpoint import save_checkpoint
            save_checkpoint(
                checkpoint_dir, epoch - 1, params=params,
                opt_state=opt_state, best_params=best_params,
                meta={"epoch": epoch - 1, "min_loss": float(min_loss),
                      "patience_remaining": int(patience_rem),
                      "best_epoch": history["best_epoch"],
                      "rng_seed": rng_seed})
        if bool(stopped):
            break

    model.params = best_params
    model._act_cache = None
    history["epochs_run"] = epoch
    return history
