"""UFLD training step, sharded over a (data, model) mesh.

The reference ships training configs + nets for UFLDv2 but no trainer
(exportLib/ultrafastLaneV2/configs/*.py — SGD hyperparams, aux-loss
weights); this module supplies the TPU-native trainer: the UFLD
row/column-anchor *classification* loss (cross-entropy over grid cells +
existence logits), optax SGD+momentum, batch DP over ``data`` and
megatron-style TP of the MLP head over ``model``.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ufld import UFLDv2Net, UFLDv2Spec
from .sharding import batch_sharding, param_shardings


def _xent(logits: jnp.ndarray, labels: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Mean cross-entropy with integer labels along ``axis`` of logits."""
    logp = jax.nn.log_softmax(logits, axis=axis)
    picked = jnp.take_along_axis(
        logp, jnp.expand_dims(labels, axis), axis=axis
    )
    return -jnp.mean(picked)


def ufld_loss(
    outputs: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    aux_weight: float = 1.0,
):
    """UFLD classification loss over row/col anchors + existence heads,
    plus the auxiliary segmentation cross-entropy when the net was built
    with ``use_aux=True`` and the batch carries ``seg_targets`` — the
    reference's training recipe (configs/*.py ``use_aux`` +
    ``sim_loss_w`` aux weights; seg head seg_model.py:16-55)."""
    loss = _xent(outputs["loc_row"], batch["row_targets"], axis=1)
    loss += _xent(outputs["loc_col"], batch["col_targets"], axis=1)
    loss += _xent(outputs["exist_row"], batch["row_exist"], axis=1)
    loss += _xent(outputs["exist_col"], batch["col_exist"], axis=1)
    if "seg_out" in outputs and "seg_targets" in batch:
        # seg_out (B, H, W, lanes+1) NHWC logits; targets (B, H, W) int
        loss += aux_weight * _xent(
            outputs["seg_out"], batch["seg_targets"], axis=-1
        )
    return loss


def make_ufld_train_state(
    spec: UFLDv2Spec,
    mesh: Mesh,
    rng: jax.Array,
    learning_rate: float = 0.05,
    momentum: float = 0.9,
    use_aux: bool = False,
) -> Tuple[UFLDv2Net, optax.GradientTransformation, Dict[str, Any]]:
    """Init net + SGD optimizer; place every leaf on the mesh.

    Params and momentum follow the TP rules (sharding.tp_param_spec);
    batch stats are replicated.  ``use_aux`` adds the training-only
    segmentation head (dropped at export, like the reference).
    """
    net = UFLDv2Net(spec, use_aux=use_aux)
    x0 = jnp.zeros((1, spec.input_height, spec.input_width, 3), jnp.float32)
    variables = net.init(rng, x0, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.sgd(learning_rate, momentum=momentum)
    opt_state = tx.init(params)

    p_shard = param_shardings(params, mesh)
    repl = NamedSharding(mesh, P())
    state = {
        "params": jax.device_put(params, p_shard),
        "batch_stats": jax.device_put(batch_stats, repl),
        "opt_state": jax.device_put(
            opt_state, _opt_shardings(opt_state, p_shard, repl)
        ),
    }
    return net, tx, state


def _opt_shardings(opt_state, p_shard, repl):
    """SGD momentum trace mirrors the param tree; other leaves replicate."""

    flat_p, treedef_p = jax.tree_util.tree_flatten(p_shard)

    def match(subtree):
        try:
            flat_s, treedef_s = jax.tree_util.tree_flatten(subtree)
            if treedef_s == treedef_p:
                return jax.tree_util.tree_unflatten(treedef_p, flat_p)
        except Exception:
            pass
        return jax.tree_util.tree_map(lambda _: repl, subtree)

    if isinstance(opt_state, tuple):
        return tuple(
            type(s)(**{k: match(getattr(s, k)) for k in s._fields})
            if hasattr(s, "_fields")
            else match(s)
            for s in opt_state
        )
    return match(opt_state)


def make_ufld_train_step(net: UFLDv2Net, tx, mesh: Mesh, state_example):
    """Jitted train step sharded over the mesh.

    ``step(state, batch) -> (state, loss)`` where batch holds ``images``
    (B,H,W,3) plus integer anchor/existence targets, all sharded over
    ``data``.
    """

    def loss_fn(params, batch_stats, batch):
        outputs, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"],
            train=True,
            mutable=["batch_stats"],
        )
        return ufld_loss(outputs, batch), mutated["batch_stats"]

    def step(state, batch):
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"], state["batch_stats"], batch)
        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return (
            {
                "params": new_params,
                "batch_stats": new_stats,
                "opt_state": new_opt,
            },
            loss,
        )

    state_shardings = {
        "params": param_shardings(state_example["params"], mesh),
        "batch_stats": jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), state_example["batch_stats"]
        ),
        "opt_state": _opt_shardings(
            state_example["opt_state"],
            param_shardings(state_example["params"], mesh),
            NamedSharding(mesh, P()),
        ),
    }
    batch_shardings = {
        "images": batch_sharding(mesh, 4),
        "row_targets": batch_sharding(mesh, 3),
        "col_targets": batch_sharding(mesh, 3),
        "row_exist": batch_sharding(mesh, 3),
        "col_exist": batch_sharding(mesh, 3),
    }
    if net.use_aux:
        # auxiliary segmentation targets at the seg head's stride-8 grid
        batch_shardings["seg_targets"] = batch_sharding(mesh, 3)
    return jax.jit(
        step,
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=0,
    )
