"""UNet3D numerical parity vs the reference PyTorch model on CPU.

Acceptance bar: <=1e-5 MAE on random weights (BASELINE.json config #1).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from aind_exaspim_neuron_segmentation_tpu.models import (  # noqa: E402
    UNet3D,
    torch_state_dict_to_variables,
    variables_to_torch_state_dict,
)
from aind_exaspim_neuron_segmentation_tpu.ops.upsample import (  # noqa: E402
    trilinear_upsample_x2,
)
from tests.reference_oracle import load_reference_unet3d_module  # noqa: E402

REF = load_reference_unet3d_module()
needs_ref = pytest.mark.skipif(REF is None, reason="reference unavailable")


def _torch_model(output_channels=3, trilinear=True, seed=0):
    torch.manual_seed(seed)
    model = REF.UNet3D(output_channels=output_channels, trilinear=trilinear)
    model.eval()
    return model


def _run_both(output_channels, trilinear, shape=(1, 1, 32, 32, 32), seed=0,
              train=False):
    tm = _torch_model(output_channels, trilinear, seed)
    if train:
        tm.train()
    variables = torch_state_dict_to_variables(
        tm.state_dict(), trilinear=trilinear
    )
    variables = jax.tree.map(jnp.asarray, variables)

    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()

    jm = UNet3D(output_channels=output_channels, trilinear=trilinear)
    x_ndhwc = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
    if train:
        out, _ = jm.apply(
            variables, x_ndhwc, train=True, mutable=["batch_stats"]
        )
    else:
        out = jm.apply(variables, x_ndhwc, train=False)
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    return ref_out, out


def test_trilinear_upsample_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, 7, 5, 3)).astype(np.float32)
    ours = np.asarray(trilinear_upsample_x2(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    ref = torch.nn.functional.interpolate(
        xt, scale_factor=2, mode="trilinear", align_corners=True
    ).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_resize_in_range_matches_full_columns():
    """in_range-sliced resize equals the full resize on a trimmed input,
    and rejects ranges that drop weighted rows."""
    from aind_exaspim_neuron_segmentation_tpu.ops.upsample import (
        linear_resize_axis,
        x2_support_trim,
    )

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 5, 4, 3)).astype(np.float32)
    full = np.asarray(
        linear_resize_axis(jnp.asarray(x), 1, 32, out_range=(6, 26))
    )
    s = x2_support_trim(16, 6, 26)
    assert s == 2
    part = np.asarray(
        linear_resize_axis(
            jnp.asarray(x[:, s:16 - s]), 1, 32, out_range=(6, 26),
            in_range=(s, 16 - s), nominal_in=16,
        )
    )
    np.testing.assert_array_equal(full, part)
    with pytest.raises(ValueError):  # rows 0..31 need every input row
        linear_resize_axis(
            jnp.asarray(x[:, 2:14]), 1, 32, in_range=(2, 14), nominal_in=16
        )
    with pytest.raises(ValueError):  # missing nominal_in
        linear_resize_axis(jnp.asarray(x[:, 2:14]), 1, 32, in_range=(2, 14))


@needs_ref
@pytest.mark.parametrize("out_ch,trilinear", [(3, True), (1, True), (3, False)])
def test_forward_parity_eval(out_ch, trilinear):
    ref_out, out = _run_both(out_ch, trilinear)
    mae = np.abs(ref_out - out).mean()
    assert mae <= 1e-5, f"MAE {mae} exceeds 1e-5 bar"
    assert ref_out.shape == out.shape


@needs_ref
def test_forward_parity_train_mode():
    # Batch statistics path (training forward) must also match.
    ref_out, out = _run_both(3, True, train=True)
    mae = np.abs(ref_out - out).mean()
    assert mae <= 1e-5, f"train-mode MAE {mae}"


@needs_ref
def test_running_stats_update_matches_torch():
    tm = _torch_model(3, True, seed=1)
    tm.train()
    variables = jax.tree.map(
        jnp.asarray, torch_state_dict_to_variables(tm.state_dict())
    )
    x = np.random.default_rng(1).standard_normal(
        (2, 1, 16, 16, 16)
    ).astype(np.float32)
    with torch.no_grad():
        tm(torch.from_numpy(x))
    jm = UNet3D(output_channels=3)
    _, updates = jm.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=True,
        mutable=["batch_stats"],
    )
    ref_sd = tm.state_dict()
    ours_sd = variables_to_torch_state_dict(
        {"params": variables["params"], **updates}
    )
    for key in ("inc.double_conv.1.running_mean",
                "inc.double_conv.1.running_var",
                "up4.conv.double_conv.4.running_var"):
        np.testing.assert_allclose(
            ours_sd[key], ref_sd[key].numpy(), atol=1e-5, err_msg=key
        )


@needs_ref
def test_state_dict_round_trip():
    tm = _torch_model(3, True, seed=2)
    sd = tm.state_dict()
    variables = torch_state_dict_to_variables(sd)
    back = variables_to_torch_state_dict(variables)
    for key, val in sd.items():
        np.testing.assert_array_equal(back[key], val.numpy(), err_msg=key)


@needs_ref
def test_width_multiplier_channels():
    torch.manual_seed(0)
    tm = REF.UNet3D(output_channels=3, width_multiplier=0.5)
    variables = torch_state_dict_to_variables(tm.state_dict())
    k = variables["params"]["inc"]["conv1"]["kernel"]
    assert k.shape[-1] == 16  # 32 * 0.5


@needs_ref
def test_fold_batchnorm_matches_torch():
    """Folded (fused_bn) f32 model matches the torch oracle <= 1e-5.

    Folding eval-mode BN into conv kernels (models/convert.fold_batchnorm)
    is the TPU inference fast path; it must stay within the reference
    parity budget (reference unet3d.py:142-149 BN semantics).
    """
    from aind_exaspim_neuron_segmentation_tpu.models.convert import (
        fold_batchnorm,
    )

    tm = _torch_model(3, True, seed=2)
    # Make running stats non-trivial so folding is actually exercised.
    with torch.no_grad():
        tm.train()
        for _ in range(2):
            tm(torch.randn(1, 1, 32, 32, 32))
        tm.eval()
    variables = torch_state_dict_to_variables(tm.state_dict())

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 1, 32, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x)).numpy()

    jm = UNet3D(output_channels=3, fused_bn=True)
    folded = jax.tree.map(jnp.asarray, fold_batchnorm(variables))
    out = jm.apply(
        folded, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False
    )
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert np.abs(out - ref_out).mean() < 1e-5
    assert np.abs(out - ref_out).max() < 1e-4


def test_fused_bn_rejects_train_mode():
    jm = UNet3D(output_channels=1, fused_bn=True)
    x = jnp.zeros((1, 8, 8, 8, 1), jnp.float32)
    with pytest.raises(ValueError, match="inference-only"):
        jm.init(jax.random.PRNGKey(0), x, train=True)


@pytest.mark.parametrize("fused_bn", [False, True])
def test_valid_trim_matches_sliced_full_forward(fused_bn):
    """valid_trim=t output is bit-identical to the sliced full forward.

    The fast path (trilinear, dims divisible by 16, t >= 2) computes the
    final decoder stage only over the trimmed core via unpadded convs on
    the exact receptive-field slab (models/unet3d.py Up); the interior
    conv windows see identical operands, so equality is exact in f32.
    """
    from aind_exaspim_neuron_segmentation_tpu.models.convert import (
        fold_batchnorm,
    )
    from aind_exaspim_neuron_segmentation_tpu.models.unet3d import (
        init_unet3d,
    )

    model, variables = init_unet3d(
        jax.random.PRNGKey(0), output_channels=3, patch_shape=(32, 32, 32)
    )
    if fused_bn:
        model = UNet3D(output_channels=3, fused_bn=True)
        variables = jax.tree.map(jnp.asarray, fold_batchnorm(variables))
    x = jax.random.normal(
        jax.random.PRNGKey(1), (2, 32, 32, 32, 1), jnp.float32
    )
    full = np.asarray(model.apply(variables, x, train=False))
    # t=1 exercises the fallback, t in (2, 4) the fast path with a full
    # up3 stage, and t in (7, 8) the cascade where up3 itself runs
    # valid-region decoding (x2_support_trim = 2 on this 32^3 geometry,
    # same as the production 96^3/t=8 grid).
    from aind_exaspim_neuron_segmentation_tpu.ops.upsample import (
        x2_support_trim,
    )

    assert x2_support_trim(16, 5, 27) == 2  # t=7
    assert x2_support_trim(16, 6, 26) == 2  # t=8
    assert x2_support_trim(16, 2, 30) == 0  # t=4: no cascade
    for t in (1, 2, 4, 7, 8):
        fast = np.asarray(
            model.apply(variables, x, train=False, valid_trim=t)
        )
        np.testing.assert_array_equal(full[:, t:-t, t:-t, t:-t, :], fast)


def test_batchnorm_train_never_nan_on_constant_channel():
    """E[x^2] - E[x]^2 in f32 can come out a few ulps NEGATIVE for a
    near-constant channel (a dead LeakyReLU channel at its bias), and
    rsqrt(var + eps) would be NaN -- poisoning the forward and, through
    the momentum update, the running stats. The clamp must hold."""
    from aind_exaspim_neuron_segmentation_tpu.models import BatchNorm3d

    # deterministic search for an input whose uncentered f32 variance
    # is negative (same seed every run; found at scale 5.3 on CPU f32)
    rng = np.random.default_rng(0)
    found = None
    for scale in (5.3, 5.7, 6.1, 4.9):
        for _ in range(300):
            x = np.full(4096, scale, np.float32)
            x += rng.normal(0, 1e-4, x.size).astype(np.float32)
            m = jnp.mean(jnp.asarray(x))
            v = jnp.mean(jnp.square(jnp.asarray(x))) - jnp.square(m)
            if float(v) < -1e-5:
                found = x
                break
        if found is not None:
            break
    if found is None:
        pytest.skip("no negative-uncentered-variance vector on this "
                    "platform's f32")
    xin = jnp.asarray(found).reshape(1, 16, 16, 16, 1)
    bn = BatchNorm3d()
    variables = bn.init(jax.random.PRNGKey(0), xin, train=True)
    out, updates = bn.apply(
        variables, xin, train=True, mutable=["batch_stats"]
    )
    assert np.isfinite(np.asarray(out)).all()
    assert np.isfinite(
        np.asarray(updates["batch_stats"]["var"])
    ).all()
    assert float(updates["batch_stats"]["var"][0]) >= 0.0


def test_state_dict_architecture_mismatch_rejected():
    """A deconv checkpoint loaded with trilinear=True (or vice versa)
    must raise like torch's strict load_state_dict, not silently drop
    the ConvTranspose weights and run a wrong model."""
    tm = _torch_model(3, trilinear=False, seed=0)
    with pytest.raises(ValueError, match="trilinear"):
        torch_state_dict_to_variables(tm.state_dict(), trilinear=True)
