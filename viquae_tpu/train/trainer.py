"""The training engine.

Replaces the reference's LightningCLI/Trainer stack
(meerqat/train/trainer.py:30-38 + Lightning internals) with one explicit
SPMD loop: a single jitted train step over the framework mesh, where

- the batch is sharded over the `data` axis (DDP parity — gradient sync is
  implicit in sharded autodiff),
- params may be sharded over the `model` axis (TP; absent in the reference),
- rematerialization (`jax.checkpoint`) replaces torch gradient checkpointing
  (trainee.py:168-196),
- orbax checkpoints + monitor-based best-keeping replace ModelCheckpoint /
  EarlyStopping (experiments/rc/viquae/config.yaml:6-18),
- metrics stream to a JSONL log instead of TensorBoard.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from viquae_tpu.core import mesh as meshlib
from viquae_tpu.core.prng import DEFAULT_SEED, SeedBundle
from viquae_tpu.train import checkpoint as ckpt_lib


@dataclasses.dataclass
class TrainerConfig:
    max_steps: int = 1000
    eval_every: int = 0              # 0 = no periodic eval
    log_every: int = 10
    ckpt_every: int = 0              # 0 = only final
    ckpt_dir: Optional[str] = None
    keep_ckpts: Optional[int] = None
    monitor: Optional[str] = None    # eval metric name for best/earlystop
    monitor_mode: str = "max"
    early_stop_patience: Optional[int] = None  # in eval rounds
    seed: int = DEFAULT_SEED
    grad_accum: int = 1
    # batches arrive PRE-microbatched with a leading grad_accum dim (one
    # packed canvas per microbatch — data.microbatch_collate); the trainer
    # scans that axis instead of slicing, which is how packing composes
    # with accumulation (slicing one canvas would corrupt its pointers)
    microbatched: bool = False
    # torch detect_anomaly counterpart (SURVEY §5.2): fail fast on NaN/Inf
    debug_nans: bool = False


class Trainer:
    """Drives a loss function over batches.

    loss_fn(params, batch, rng) -> (loss, aux_dict). Batches are dicts of
    numpy arrays with LEADING GLOBAL batch dim; the trainer shards them over
    `data` and keeps params per `param_spec` (replicated by default).
    """

    def __init__(
        self,
        loss_fn: Callable,
        params,
        optimizer: optax.GradientTransformation,
        config: TrainerConfig = TrainerConfig(),
        mesh_ctx: Optional[meshlib.MeshContext] = None,
        param_spec=None,
        eval_fn: Optional[Callable] = None,
        batch_spec: Optional[dict] = None,
    ):
        self.cfg = config
        if config.monitor_mode not in ("max", "min"):
            # anything else would silently freeze best-keeping after the
            # first eval (both mode comparisons evaluate False)
            raise ValueError(
                f"monitor_mode must be 'max' or 'min', got "
                f"{config.monitor_mode!r}"
            )
        if config.microbatched and config.grad_accum < 2:
            # the accum==1 fast path would feed loss_fn batches with the
            # spurious leading microbatch dim unsquashed
            raise ValueError(
                "microbatched=True requires grad_accum >= 2 (batches carry "
                "a leading grad_accum dim — data.microbatch_collate)"
            )
        if config.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.mesh_ctx = mesh_ctx or meshlib.current()
        self.loss_fn = loss_fn
        self.eval_fn = eval_fn
        self.tx = optimizer
        self.seeds = SeedBundle(config.seed)
        self.history: list = []

        ctx = self.mesh_ctx
        # take ownership: train_step DONATES the state, and device_put
        # aliases (doesn't copy) arrays whose sharding already matches —
        # without a copy, the first step would delete arrays the caller
        # still holds (host numpy inputs are unaffected: device_put makes
        # a fresh device buffer for those)
        params = jax.tree_util.tree_map(
            lambda p: p.copy() if isinstance(p, jax.Array) else p, params
        )
        if param_spec is not None:
            params = jax.tree_util.tree_map(
                lambda p, s: jax.device_put(p, ctx.sharding(*s)),
                params, param_spec,
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec),
            )
        else:
            params = jax.device_put(params, ctx.replicated)
        self.state = {
            "params": params,
            "opt_state": self.tx.init(params),
            "step": jnp.zeros((), jnp.int32),
        }
        self._batch_sharding = (
            batch_spec or {}
        )  # key -> PartitionSpec; default data-sharded leading dim

        accum = max(int(config.grad_accum), 1)

        # donate the state: an undonated adam step holds params + moments
        # TWICE during the update (the round-2 batch-512 configs only fit
        # with donation); the loop always replaces self.state with the
        # returned new_state, so the old buffers are never reused
        @functools.partial(jax.jit, donate_argnums=(0,))
        def train_step(state, batch, rng):
            grad_fn = jax.value_and_grad(
                lambda p, b, r: self.loss_fn(p, b, r), has_aux=True
            )
            if accum == 1:
                (loss, aux), grads = grad_fn(state["params"], batch, rng)
            else:
                # microbatch accumulation (Lightning accumulate_grad_batches
                # parity): split the global batch into `accum` slices, scan a
                # grad computation over them, average. Exactly equals the
                # full-batch gradient for mean-reduced per-example losses;
                # for batch-coupled losses (in-batch negatives) it has the
                # standard smaller-negative-pool semantics, same as DDP+accum
                # in the reference recipe (EXPERIMENTS.rst:274-279).
                if config.microbatched:
                    # batches arrive with a leading accum dim; each slice is
                    # a self-contained microbatch (its own packed canvas,
                    # pointers local — data.microbatch_collate)
                    def check(x):
                        if x.shape[0] != accum:
                            raise ValueError(
                                f"microbatched=True expects every leaf to "
                                f"lead with grad_accum={accum}, got shape "
                                f"{x.shape}. Wrap the collator with "
                                "data.microbatch_collate(collate, accum)."
                            )
                        return x

                    micro = jax.tree_util.tree_map(check, batch)
                else:
                    flat_keys = [
                        "/".join(str(getattr(p, "key", p)) for p in path)
                        for path, _ in jax.tree_util.tree_flatten_with_path(
                            batch)[0]
                    ]
                    bad = [k for k in flat_keys
                           if "canvas_" in k or "gather_idx" in k]
                    if bad:
                        raise ValueError(
                            "grad_accum > 1 cannot split packed-canvas "
                            f"batches: keys {bad[:3]} hold pointers into the "
                            "FULL canvas, so slicing rows silently corrupts "
                            "the gather. Pack per-microbatch instead: wrap "
                            "the collator with data.microbatch_collate and "
                            "set TrainerConfig(microbatched=True)."
                        )
                    if any(k.split("/")[-1] == "labels" for k in flat_keys):
                        # in-batch-contrastive labels index the FULL
                        # batch's rows (biencoder: context row i; CLIP:
                        # arange(N)); a reshape slice keeps the global
                        # values while each microbatch's similarity matrix
                        # is LOCAL — microbatches j>=1 would train against
                        # the wrong positives, silently
                        raise ValueError(
                            "grad_accum > 1 cannot reshape-split batches "
                            "with in-batch `labels` (their values index "
                            "the full batch). Collate per-microbatch: wrap "
                            "the collator with data.microbatch_collate and "
                            "set TrainerConfig(microbatched=True) — "
                            "train.run.run_from_config does this "
                            "automatically."
                        )

                    def to_micro(x):
                        if x.shape[0] % accum:
                            raise ValueError(
                                f"grad_accum={accum} requires every batch "
                                f"leading dim to be divisible by it, got "
                                f"shape {x.shape}"
                            )
                        return x.reshape((accum, x.shape[0] // accum)
                                         + x.shape[1:])

                    micro = jax.tree_util.tree_map(to_micro, batch)
                rngs = jax.random.split(rng, accum)
                params = state["params"]
                zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

                def body(carry, xs):
                    g_acc, l_acc = carry
                    mb, r = xs
                    (l, aux_i), g = grad_fn(params, mb, r)
                    g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                    return (g_acc, l_acc + l), aux_i

                (grads, loss), aux = jax.lax.scan(
                    body, (zeros, jnp.zeros(())), (micro, rngs)
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
                loss = loss / accum
                # aux from the last microbatch (scan stacks; take index -1)
                aux = jax.tree_util.tree_map(lambda a: a[-1], aux)
            updates, opt_state = self.tx.update(
                grads, state["opt_state"], state["params"]
            )
            new_params = optax.apply_updates(state["params"], updates)
            metrics = {
                "loss": loss,
                "grad_norm": optax.global_norm(grads),
            }
            new_state = {
                "params": new_params,
                "opt_state": opt_state,
                "step": state["step"] + 1,
            }
            return new_state, metrics, aux

        self._train_step = train_step

    # ------------------------------------------------------------------
    def _shard_batch(self, batch):
        """Device-put a (possibly nested) batch pytree, sharding the leading
        dim over `data`. Non-array leaves (answer strings etc.) are DROPPED
        — they are host-side bookkeeping the jitted step cannot take (the
        reference pops them in transfer_batch_to_device the same way)."""
        ctx = self.mesh_ctx

        def is_host_only(v):
            if isinstance(v, (str, bytes)):
                return True
            if isinstance(v, list):
                # rectangular numeric nested lists are valid array data
                # (jnp.asarray handles them); only genuinely ragged or
                # string-carrying lists are host-side bookkeeping
                try:
                    arr = np.asarray(v)
                except (ValueError, TypeError):
                    return True
                return arr.dtype.kind in "OUS"
            return False

        micro = self.cfg.microbatched and self.cfg.grad_accum > 1

        def put(key, v):
            # keep host arrays on host until device_put: jnp.asarray would
            # land the FULL array on the default device first and then
            # reshard device-to-device — twice the transfer per step on
            # the link that already serializes copies with compute
            arr = v if isinstance(v, (np.ndarray, jax.Array)) \
                else np.asarray(v)
            spec = self._batch_sharding.get(key)
            if spec is not None:
                sharding = ctx.sharding(*spec)
            elif micro:
                # leading dim is grad_accum; the batch dim to shard over
                # `data` is axis 1 (same rule as below, shifted one axis in)
                if arr.ndim > 1 and arr.shape[1] % ctx.data_size == 0:
                    sharding = ctx.sharding(None, meshlib.DATA_AXIS)
                else:
                    sharding = ctx.replicated
            elif arr.ndim > 0 and arr.shape[0] % ctx.data_size == 0:
                sharding = ctx.batch_sharded
            else:  # leading dim not divisible by the data axis: replicate
                sharding = ctx.replicated
            return jax.device_put(arr, sharding)

        def walk(node, key=None):
            if isinstance(node, dict):
                out = {}
                for k, v in node.items():
                    if is_host_only(v):
                        continue
                    out[k] = walk(v, k)
                return out
            return put(key, node)

        return walk(batch)

    def fit(
        self,
        train_batches,
        eval_batches: Optional[Callable[[], Iterable]] = None,
        resume: bool = False,
    ) -> Dict[str, Any]:
        """train_batches is either an iterable of batches (legacy; resume
        replays the stream to fast-forward, O(steps)) or a *step-indexed
        source* — a callable ``step -> batch`` — which makes resume O(1):
        the restored step simply indexes back into the same deterministic
        batch sequence. Collator factories in train/data.py build such
        sources via :func:`step_indexed_batches`."""
        cfg = self.cfg
        start_step = 0
        if resume and cfg.ckpt_dir and ckpt_lib.all_steps(cfg.ckpt_dir):
            self.state, start_step = ckpt_lib.restore_state(
                cfg.ckpt_dir, self.state
            )
        best_metric, best_step, since_best = None, None, 0
        t0 = time.time()
        step = start_step
        indexed = callable(train_batches) and not hasattr(
            train_batches, "__iter__"
        )
        if indexed:
            def next_batch(step):
                return train_batches(step)
        else:
            train_iter = iter(train_batches)
            # fast-forward the data stream so a resumed run sees the same
            # batch sequence as an uninterrupted one
            for _ in range(start_step):
                try:
                    next(train_iter)
                except StopIteration:
                    train_iter = iter(train_batches)
                    next(train_iter)

            def next_batch(step):
                nonlocal train_iter
                try:
                    return next(train_iter)
                except StopIteration:
                    train_iter = iter(train_batches)
                    return next(train_iter)

        while step < cfg.max_steps:
            batch = next_batch(step)
            rng = self.seeds.split(f"step{step}")
            self.state, metrics, _ = self._train_step(
                self.state, self._shard_batch(batch), rng
            )
            step += 1
            if cfg.log_every and step % cfg.log_every == 0:
                entry = {
                    "step": step,
                    "loss": float(metrics["loss"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "elapsed_s": round(time.time() - t0, 3),
                }
                self.history.append(entry)
                self._log(entry)
            if cfg.ckpt_every and cfg.ckpt_dir and step % cfg.ckpt_every == 0:
                ckpt_lib.save_state(
                    cfg.ckpt_dir, self.state, step, keep=cfg.keep_ckpts
                )
            if cfg.eval_every and step % cfg.eval_every == 0 and eval_batches:
                eval_metrics = self.evaluate(eval_batches())
                entry = {"step": step, **{f"eval/{k}": v for k, v in eval_metrics.items()}}
                self.history.append(entry)
                self._log(entry)
                if cfg.monitor:
                    current = eval_metrics[cfg.monitor]
                    better = (
                        best_metric is None
                        or (cfg.monitor_mode == "max" and current > best_metric)
                        or (cfg.monitor_mode == "min" and current < best_metric)
                    )
                    if better:
                        best_metric, best_step, since_best = current, step, 0
                        if cfg.ckpt_dir:
                            # only the max step under best/ is ever
                            # restored — keep=1 avoids accumulating a full
                            # params+opt_state copy per improvement
                            ckpt_lib.save_state(
                                Path(cfg.ckpt_dir) / "best", self.state,
                                step, keep=1,
                            )
                    else:
                        since_best += 1
                        if (
                            cfg.early_stop_patience
                            and since_best >= cfg.early_stop_patience
                        ):
                            break
        if cfg.ckpt_dir:
            ckpt_lib.save_state(
                cfg.ckpt_dir, self.state, step, keep=cfg.keep_ckpts
            )
        return {
            "final_step": step,
            "best_metric": best_metric,
            "best_step": best_step,
            "history": self.history,
        }

    def evaluate(self, eval_batches: Iterable) -> Dict[str, float]:
        """Mean loss + eval_fn aggregation over batches (no grad, and with
        dropout DISABLED when the loss_fn exposes a `deterministic` flag)."""
        if not hasattr(self, "_eval_step"):
            import inspect

            loss_fn = self.loss_fn
            try:
                accepts_det = "deterministic" in inspect.signature(
                    loss_fn
                ).parameters
            except (TypeError, ValueError):
                accepts_det = False
            if accepts_det:
                loss_fn = functools.partial(loss_fn, deterministic=True)
            self._eval_step = jax.jit(loss_fn)
        outputs = []
        host_batches = []
        losses = []
        for i, batch in enumerate(eval_batches):
            # fold the batch index in: one fixed key for every batch would
            # correlate dropout masks across the whole eval set when the
            # loss_fn has no `deterministic` flag; keeping the key a pure
            # function of i makes eval rounds comparable (paired noise)
            rng = self.seeds.split(f"eval{i}")
            loss, aux = self._eval_step(
                self.state["params"], self._shard_batch(batch), rng
            )
            losses.append(float(loss))
            outputs.append(aux)
            host_batches.append(batch)
        metrics = {"loss": float(np.mean(losses)) if losses else 0.0}
        if self.eval_fn is not None:
            import inspect

            # a 2-arg eval_fn also receives the ORIGINAL host batches
            # (readers need input_ids/answer_strings to turn the aux log
            # probs into text-level EM/F1)
            try:
                two_arg = len(inspect.signature(
                    self.eval_fn).parameters) >= 2
            except (TypeError, ValueError):
                two_arg = False
            metrics.update(
                self.eval_fn(outputs, host_batches) if two_arg
                else self.eval_fn(outputs)
            )
        return metrics

    def _log(self, entry: dict):
        print(json.dumps(entry))
        if self.cfg.ckpt_dir:
            path = Path(self.cfg.ckpt_dir)
            path.mkdir(parents=True, exist_ok=True)
            with open(path / "log.jsonl", "a") as f:
                f.write(json.dumps(entry) + "\n")
