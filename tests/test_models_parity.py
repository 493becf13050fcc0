"""Golden parity: JAX model zoo vs torch oracle nets with shared weights."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from adas_tpu.models.resnet import ResNetFeatures  # noqa: E402
from adas_tpu.models.ufld import (  # noqa: E402
    UFLDv1Net,
    UFLDv1Spec,
    UFLDv2Net,
    UFLDv2Spec,
)
from adas_tpu.tools.torch_import import (  # noqa: E402
    resnet_variables,
    ufld_variables,
)
from torch_nets import (  # noqa: E402
    TorchResNet18,
    TorchUFLDv1,
    TorchUFLDv2,
    randomize_bn_stats,
)

pytestmark = pytest.mark.slow  # heavyweight tier (see pyproject markers)


def state_to_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def torch_seed():
    torch.manual_seed(0)
    return 0


def test_resnet18_feature_parity(torch_seed):
    tmodel = TorchResNet18().eval()
    randomize_bn_stats(tmodel)
    x = torch.randn(1, 3, 64, 96)
    with torch.no_grad():
        tx2, tx3, tx4 = tmodel(x)

    variables = resnet_variables(state_to_numpy(tmodel))
    jx = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    jx2, jx3, jx4 = ResNetFeatures(depth="18").apply(variables, jx)

    for got, want in [(jx2, tx2), (jx3, tx3), (jx4, tx4)]:
        np.testing.assert_allclose(
            np.array(got).transpose(0, 3, 1, 2), want.numpy(),
            atol=2e-4, rtol=1e-3,
        )


@pytest.mark.parametrize("fc_norm", [True, False])
def test_ufldv2_parity(torch_seed, fc_norm):
    h, w = 64, 160
    spec = UFLDv2Spec(
        input_height=h, input_width=w, crop_ratio=0.6,
        num_cell_row=10, num_row=6, num_cell_col=8, num_col=5,
        num_lanes=2, fc_norm=fc_norm, mlp_mid=64,
    )
    tmodel = TorchUFLDv2(h, w, spec.dims, fc_norm=fc_norm).eval()
    randomize_bn_stats(tmodel)
    x = torch.randn(2, 3, h, w)
    with torch.no_grad():
        tout = tmodel(x).numpy()

    variables = ufld_variables(
        state_to_numpy(tmodel), version=2, fc_norm=fc_norm
    )
    jx = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = UFLDv2Net(spec).apply(variables, jx)
    # reassemble concat order: loc_row | loc_col | exist_row | exist_col
    b = tout.shape[0]
    got = np.concatenate(
        [
            np.array(out["loc_row"]).reshape(b, -1),
            np.array(out["loc_col"]).reshape(b, -1),
            np.array(out["exist_row"]).reshape(b, -1),
            np.array(out["exist_col"]).reshape(b, -1),
        ],
        axis=1,
    )
    np.testing.assert_allclose(got, tout, atol=5e-4, rtol=1e-3)


def test_ufldv1_parity(torch_seed):
    h, w = 64, 96
    spec = UFLDv1Spec(
        input_height=h, input_width=w, griding_num=10,
        cls_num_per_lane=4, num_lanes=2, mlp_mid=64,
    )
    total = (spec.griding_num + 1) * spec.cls_num_per_lane * spec.num_lanes
    tmodel = TorchUFLDv1(h, w, total).eval()
    randomize_bn_stats(tmodel)
    x = torch.randn(1, 3, h, w)
    with torch.no_grad():
        tout = tmodel(x).numpy()

    variables = ufld_variables(state_to_numpy(tmodel), version=1)
    jx = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = np.array(UFLDv1Net(spec).apply(variables, jx))
    np.testing.assert_allclose(
        out.reshape(1, -1), tout.reshape(1, -1), atol=5e-4, rtol=1e-3
    )
    assert out.shape == (
        1, spec.griding_num + 1, spec.cls_num_per_lane, spec.num_lanes
    )


def test_ufldv2_tta_and_aux():
    """TTA yields 5x batch of identically-shaped outputs; use_aux adds a
    seg_out map (parity with exportLib model_culane.py:40-96)."""
    import jax
    import jax.numpy as jnp

    from adas_tpu.models.ufld import UFLDv2Net, UFLDv2Spec

    spec = UFLDv2Spec(
        input_height=64, input_width=128, crop_ratio=0.8,
        num_cell_row=16, num_row=8, num_cell_col=16, num_col=8,
        fc_norm=True, mlp_mid=64, img_w=128, img_h=64,
    )
    net = UFLDv2Net(spec, use_aux=True)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 128, 3)),
        jnp.float32,
    )
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert out["loc_row"].shape == (2, 16, 8, 4)
    assert out["seg_out"].shape[0] == 2 and out["seg_out"].shape[-1] == 5

    tta = net.apply(variables, x, tta=True)
    assert tta["loc_row"].shape == (10, 16, 8, 4)
    # slot 0 of the TTA batch equals the plain forward (unshifted copy)
    np.testing.assert_allclose(
        np.asarray(tta["loc_row"][:2]), np.asarray(out["loc_row"]),
        rtol=1e-5, atol=1e-5,
    )


def test_ufldv2_curvelanes_parity(torch_seed):
    """20-lane-token CurveLanes head vs a torch oracle of the reference's
    model_curvelanes.py structure (shared random weights)."""
    from torch_nets import TorchUFLDv2CurveLanes

    from adas_tpu.models.ufld import UFLDv2CurveLanesNet
    from adas_tpu.tools.torch_import import ufld_curvelanes_variables

    h, w = 64, 160
    spec = UFLDv2Spec(
        input_height=h, input_width=w, crop_ratio=0.8,
        num_cell_row=10, num_row=6, num_cell_col=8, num_col=5,
        fc_norm=True, mlp_mid=64,
    )
    tmodel = TorchUFLDv2CurveLanes(
        h, w, grid_row=10, cls_row=6, grid_col=8, cls_col=5, mid=64
    ).eval()
    randomize_bn_stats(tmodel)
    x = torch.randn(2, 3, h, w)
    with torch.no_grad():
        tout = {k: v.numpy() for k, v in tmodel(x).items()}

    variables = ufld_curvelanes_variables(state_to_numpy(tmodel))
    jx = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = UFLDv2CurveLanesNet(spec).apply(variables, jx)
    assert set(out) == set(tout)
    for k in tout:
        np.testing.assert_allclose(
            np.asarray(out[k]), tout[k], atol=5e-4, rtol=1e-3,
            err_msg=k,
        )


def test_curvelanes_registry_buildable():
    """The registry builds the CurveLanes net (exportable), matching the
    reference shipping the net while its runtime rejects the dataset."""
    import jax

    from adas_tpu.engine import registry
    from adas_tpu.models.ufld import UFLDv2CurveLanesNet

    e = registry.build("UFLDV2_CURVELANES")
    assert isinstance(e.net, UFLDv2CurveLanesNet)
    assert e.input_shape_nchw == (1, 3, 800, 1600)
