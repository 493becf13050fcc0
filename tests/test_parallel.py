"""Multi-device tests on the 8-virtual-CPU mesh (SURVEY.md §4: the JAX
analogue of fake multi-node).  conftest forces
``xla_force_host_platform_device_count=8``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adas_tpu.parallel import make_mesh
from adas_tpu.parallel.sharding import tp_param_spec
from jax.sharding import PartitionSpec as P

pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject markers)


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)
    mesh1 = make_mesh(1)
    assert mesh1.devices.shape == (1, 1)


def test_tp_param_spec_rules():
    class K:  # stand-in for jax DictKey
        def __init__(self, key):
            self.key = key

    assert tp_param_spec((K("cls_fc1"), K("kernel")), None) == P(None, "model")
    assert tp_param_spec((K("cls_fc1"), K("bias")), None) == P("model")
    assert tp_param_spec((K("cls_fc2"), K("kernel")), None) == P("model", None)
    assert tp_param_spec((K("cls_fc2"), K("bias")), None) == P()
    assert tp_param_spec((K("backbone"), K("conv1"), K("kernel")), None) == P()


def test_dryrun_multichip_executes():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_train_step_matches_single_device():
    """Loss from the 8-way sharded step equals the unsharded loss."""
    from adas_tpu.models.ufld import UFLDv2Spec
    from adas_tpu.parallel import make_ufld_train_state, make_ufld_train_step
    from adas_tpu.parallel.sharding import batch_sharding

    spec = UFLDv2Spec(
        input_height=64, input_width=128, crop_ratio=0.8,
        num_cell_row=16, num_row=8, num_cell_col=16, num_col=8,
        fc_norm=True, mlp_mid=64, img_w=128, img_h=64,
    )
    rng = np.random.default_rng(1)
    b = 8
    batch_np = {
        "images": rng.normal(size=(b, 64, 128, 3)).astype(np.float32),
        "row_targets": rng.integers(0, 16, (b, 8, 4)),
        "col_targets": rng.integers(0, 16, (b, 8, 4)),
        "row_exist": rng.integers(0, 2, (b, 8, 4)),
        "col_exist": rng.integers(0, 2, (b, 8, 4)),
    }

    losses = {}
    for n in (1, 8):
        mesh = make_mesh(n)
        net, tx, state = make_ufld_train_state(
            spec, mesh, jax.random.PRNGKey(0)
        )
        step = make_ufld_train_step(net, tx, mesh, state)
        batch = {
            k: jax.device_put(
                jnp.asarray(v), batch_sharding(mesh, np.ndim(v))
            )
            for k, v in batch_np.items()
        }
        _, loss = step(state, batch)
        losses[n] = float(loss)
    assert losses[1] == pytest.approx(losses[8], rel=2e-5)


def test_checkpoint_save_restore(tmp_path):
    """Sharded train state round-trips through orbax with shardings."""
    from adas_tpu.models.ufld import UFLDv2Spec
    from adas_tpu.parallel import make_ufld_train_state
    from adas_tpu.parallel.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )

    spec = UFLDv2Spec(
        input_height=64, input_width=128, crop_ratio=0.8,
        num_cell_row=16, num_row=8, num_cell_col=16, num_col=8,
        fc_norm=True, mlp_mid=64, img_w=128, img_h=64,
    )
    mesh = make_mesh(8)
    _, _, state = make_ufld_train_state(spec, mesh, jax.random.PRNGKey(7))
    root = str(tmp_path / "ckpt")
    save_train_state(root, state, step=3)
    target = latest_checkpoint(root)
    assert target and target.endswith("step_00000003")

    _, _, fresh = make_ufld_train_state(spec, mesh, jax.random.PRNGKey(8))
    restored, step = restore_train_state(target, fresh)
    assert step == 3
    orig_kernel = np.asarray(state["params"]["cls_fc1"]["kernel"])
    back_kernel = np.asarray(restored["params"]["cls_fc1"]["kernel"])
    np.testing.assert_array_equal(orig_kernel, back_kernel)
    # sharding preserved (TP over model axis)
    assert (
        restored["params"]["cls_fc1"]["kernel"].sharding
        == fresh["params"]["cls_fc1"]["kernel"].sharding
    )


def test_aux_seg_training(tmp_path):
    """use_aux=True trains with the reference's auxiliary segmentation
    loss (configs/*.py use_aux + seg_model.py SegHead): seg head params
    exist, loss includes the seg term, and a few steps reduce it."""
    from adas_tpu.models.ufld import UFLDv2Spec
    from adas_tpu.parallel import make_ufld_train_state, make_ufld_train_step
    from adas_tpu.parallel.sharding import batch_sharding

    spec = UFLDv2Spec(
        input_height=64, input_width=128, crop_ratio=0.8,
        num_cell_row=16, num_row=8, num_cell_col=16, num_col=8,
        fc_norm=True, mlp_mid=64, img_w=128, img_h=64,
    )
    mesh = make_mesh(8)
    net, tx, state = make_ufld_train_state(
        spec, mesh, jax.random.PRNGKey(0), learning_rate=0.02,
        use_aux=True,
    )
    assert "seg_head" in state["params"]
    step = make_ufld_train_step(net, tx, mesh, state)

    rng = np.random.default_rng(3)
    b = 8
    batch_np = {
        "images": rng.normal(size=(b, 64, 128, 3)).astype(np.float32),
        "row_targets": rng.integers(0, 16, (b, 8, 4)),
        "col_targets": rng.integers(0, 16, (b, 8, 4)),
        "row_exist": rng.integers(0, 2, (b, 8, 4)),
        "col_exist": rng.integers(0, 2, (b, 8, 4)),
        # seg head emits at stride 8 of the input
        "seg_targets": rng.integers(0, 5, (b, 8, 16)),
    }
    batch = {
        k: jax.device_put(jnp.asarray(v), batch_sharding(mesh, np.ndim(v)))
        for k, v in batch_np.items()
    }
    losses = []
    for _ in range(4):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # aux loss is actually part of the objective: same weights/batch
    # WITHOUT seg_targets yields a smaller loss value
    from adas_tpu.parallel.train import ufld_loss

    x = jnp.asarray(batch_np["images"][:1])
    outs = net.apply(
        {"params": jax.device_get(state["params"]),
         "batch_stats": jax.device_get(state["batch_stats"])},
        x, train=False,
    )
    b1 = {k: jnp.asarray(v[:1]) for k, v in batch_np.items()}
    with_aux = float(ufld_loss(outs, b1))
    without = float(
        ufld_loss(outs, {k: v for k, v in b1.items() if k != "seg_targets"})
    )
    assert with_aux > without
