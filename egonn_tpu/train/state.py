"""Train state + optimizer construction + checkpointing.

Optimizer parity with the reference (training/trainer.py:80-94): Adam(lr) with
torch-style COUPLED weight decay (grad += wd * param, i.e. L2 regularization fed
through Adam's moments — NOT AdamW), and MultiStepLR(gamma=0.1) or
CosineAnnealingLR(T_max=epochs+1, eta_min=min_lr) stepped per epoch.

Checkpointing is a deliberate upgrade over the reference (which saves bare
state_dicts and cannot resume — SURVEY.md §5): full train state (params, batch
stats, optimizer state, epoch) via orbax, with resume.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray  # () int32 — schedules are stepped per epoch

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_lr_schedule(params) -> optax.Schedule:
    """Epoch-indexed LR schedule from TrainingParams."""
    if params.scheduler is None:
        return lambda epoch: params.lr
    if params.scheduler == "MultiStepLR":
        milestones = sorted(params.scheduler_milestones)

        def sched(epoch):
            lr = params.lr
            factor = jnp.ones((), jnp.float32)
            for m in milestones:
                factor = factor * jnp.where(epoch >= m, 0.1, 1.0)
            return lr * factor

        return sched
    if params.scheduler == "CosineAnnealingLR":
        t_max = params.epochs + 1

        def sched(epoch):
            return params.min_lr + 0.5 * (params.lr - params.min_lr) * (
                1 + jnp.cos(jnp.pi * jnp.minimum(epoch, t_max) / t_max)
            )

        return sched
    raise NotImplementedError(params.scheduler)


def make_optimizer(params) -> optax.GradientTransformation:
    """LR-less transform; the train step applies `param -= lr * update` with the
    epoch schedule's lr, so one compiled step serves all epochs."""
    wd = params.weight_decay
    txs = []
    if wd is not None and wd != 0:
        txs.append(optax.add_decayed_weights(wd))  # torch Adam's coupled L2
    txs.append(optax.scale_by_adam())
    return optax.chain(*txs)


def apply_updates_with_lr(params, updates, lr):
    return jax.tree.map(lambda p, u: p + (-lr) * u, params, updates)


def init_train_state(variables, tx) -> TrainState:
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        epoch=jnp.zeros((), jnp.int32),
    )


# ----------------------------------------------------------------------------
# Checkpointing (orbax)
# ----------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int,
                    extra_meta: Optional[dict] = None):
    """Save the full train state; `extra_meta` (JSON-serializable host-side
    training state, e.g. the sampler's current expanded batch size) rides in a
    sidecar `step_N.meta.json` so resume restores the whole trajectory, not
    just the device state."""
    import orbax.checkpoint as ocp

    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
        ckptr.save(path, jax.device_get(state), force=True)
    if extra_meta is not None:
        import json

        with open(os.path.join(ckpt_dir, f"step_{step}.meta.json"), "w") as f:
            json.dump(extra_meta, f)


def load_checkpoint_meta(ckpt_dir: str, step: int) -> dict:
    """The sidecar meta saved with `save_checkpoint(..., extra_meta=...)`;
    {} when the checkpoint predates the sidecar."""
    import json

    path = os.path.join(ckpt_dir, f"step_{step}.meta.json")
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def load_checkpoint(ckpt_dir: str, step: Optional[int] = None,
                    template: Optional[TrainState] = None) -> tuple[TrainState, int]:
    import orbax.checkpoint as ocp

    steps = sorted(
        int(d.split("_")[1])
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and os.path.isdir(os.path.join(ckpt_dir, d))
    )
    assert steps, f"no checkpoints under {ckpt_dir}"
    step = step if step is not None else steps[-1]
    with ocp.StandardCheckpointer() as ckptr:
        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
        if template is not None:
            state = ckptr.restore(path, template)
        else:
            # template-free restore yields a plain dict; rebuild the TrainState
            raw = ckptr.restore(path)
            state = TrainState(
                params=raw["params"],
                batch_stats=raw["batch_stats"],
                opt_state=raw["opt_state"],
                epoch=jnp.asarray(raw["epoch"], jnp.int32),
            )
    return state, step
