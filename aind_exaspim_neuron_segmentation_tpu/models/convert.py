"""PyTorch ``.pth`` state_dict <-> Flax variables conversion.

Honors the reference checkpoint contract: training saves a bare
``state_dict`` (reference: machine_learning/train.py:286) and
``load_model`` restores it (reference: inference.py:400-424). This module
maps those keys onto the :class:`~..models.unet3d.UNet3D` variable tree and
back, so reference-trained weights run on TPU and TPU-trained weights can
be exported for reference users.

Key correspondence (torch -> flax):

==============================================  =============================
``inc.double_conv.{0,3}``                        ``inc/{conv1,conv2}``
``inc.double_conv.{1,4}``                        ``inc/{bn1,bn2}``
``down{i}.maxpool_conv.1.double_conv.*``         ``down{i}/conv/*``
``up{i}.conv.double_conv.*``                     ``up{i}/conv/*``
``up{i}.up``  (ConvTranspose, trilinear=False)   ``up{i}/up``
``outc.conv``                                    ``outc``
==============================================  =============================

Conv3d weights (O, I, D, H, W) transpose to Flax (D, H, W, I, O);
ConvTranspose3d weights (I, O, D, H, W) transpose to (D, H, W, I, O) with a
spatial flip (lax.conv_transpose kernel convention); BatchNorm
``weight/bias/running_mean/running_var`` map to
``scale/bias`` params and ``mean/var`` batch_stats.
"""

import numpy as np


def _double_conv_entries(torch_prefix, flax_path):
    """(torch key prefix, flax path tuple, kind) rows for one DoubleConv."""
    rows = []
    for t_idx, f_name in (("0", "conv1"), ("3", "conv2")):
        rows.append((f"{torch_prefix}.{t_idx}", flax_path + (f_name,), "conv"))
    for t_idx, f_name in (("1", "bn1"), ("4", "bn2")):
        rows.append((f"{torch_prefix}.{t_idx}", flax_path + (f_name,), "bn"))
    return rows


def _layout(trilinear=True):
    rows = _double_conv_entries("inc.double_conv", ("inc",))
    for i in range(1, 5):
        rows += _double_conv_entries(
            f"down{i}.maxpool_conv.1.double_conv", (f"down{i}", "conv")
        )
    for i in range(1, 5):
        rows += _double_conv_entries(
            f"up{i}.conv.double_conv", (f"up{i}", "conv")
        )
        if not trilinear:
            rows.append((f"up{i}.up", (f"up{i}", "up"), "deconv"))
    rows.append(("outc.conv", ("outc",), "conv"))
    return rows


def _set(tree, path, leaf):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = leaf


def _get(tree, path):
    node = tree
    for key in path:
        node = node[key]
    return node


def torch_state_dict_to_variables(state_dict, trilinear=True):
    """Convert a reference ``state_dict`` to ``{'params', 'batch_stats'}``.

    Accepts tensors or numpy arrays as values; returns numpy-leaved dicts
    ready for ``model.apply``.
    """
    # np.array copies: torch tensors otherwise alias our arrays and any
    # later in-place update (e.g. running stats) would corrupt them.
    sd = {k: np.array(getattr(v, "cpu", lambda: v)()) for k, v in
          state_dict.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    params, stats = {}, {}
    for t_prefix, f_path, kind in _layout(trilinear):
        if kind == "conv":
            w = take(f"{t_prefix}.weight")  # (O, I, D, H, W)
            _set(params, f_path + ("kernel",),
                 np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0)))
            _set(params, f_path + ("bias",), take(f"{t_prefix}.bias"))
        elif kind == "deconv":
            w = take(f"{t_prefix}.weight")  # (I, O, D, H, W)
            w = w.transpose(2, 3, 4, 0, 1)[::-1, ::-1, ::-1]
            _set(params, f_path + ("kernel",), np.ascontiguousarray(w))
            _set(params, f_path + ("bias",), take(f"{t_prefix}.bias"))
        else:  # bn
            _set(params, f_path + ("scale",), take(f"{t_prefix}.weight"))
            _set(params, f_path + ("bias",), take(f"{t_prefix}.bias"))
            _set(stats, f_path + ("mean",),
                 take(f"{t_prefix}.running_mean"))
            _set(stats, f_path + ("var",),
                 take(f"{t_prefix}.running_var"))
    # strict like torch load_state_dict: unconsumed keys mean the
    # checkpoint was built for a DIFFERENT architecture (e.g. a
    # trilinear-flag mismatch leaves the ConvTranspose weights
    # unread); loading it silently would run a wrong model.
    leftover = sorted(
        k for k in sd
        if k not in used and not k.endswith("num_batches_tracked")
    )
    if leftover:
        raise ValueError(
            f"unexpected state_dict keys (checkpoint/architecture "
            f"mismatch -- wrong trilinear={trilinear}?): "
            f"{leftover[:6]}{'...' if len(leftover) > 6 else ''}"
        )
    return {"params": params, "batch_stats": stats}


def variables_to_torch_state_dict(variables, trilinear=True):
    """Convert Flax variables back to a reference-shaped ``state_dict``.

    Returns numpy arrays; callers wrap with ``torch.tensor`` before
    ``torch.save`` (see ``machine_learning.train.Trainer.save_model``).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd = {}
    for t_prefix, f_path, kind in _layout(trilinear):
        if kind == "conv":
            k = np.asarray(_get(params, f_path + ("kernel",)))
            sd[f"{t_prefix}.weight"] = np.ascontiguousarray(
                k.transpose(4, 3, 0, 1, 2)
            )
            sd[f"{t_prefix}.bias"] = np.asarray(_get(params, f_path + ("bias",)))
        elif kind == "deconv":
            k = np.asarray(_get(params, f_path + ("kernel",)))
            k = k[::-1, ::-1, ::-1].transpose(3, 4, 0, 1, 2)
            sd[f"{t_prefix}.weight"] = np.ascontiguousarray(k)
            sd[f"{t_prefix}.bias"] = np.asarray(_get(params, f_path + ("bias",)))
        else:
            sd[f"{t_prefix}.weight"] = np.asarray(_get(params, f_path + ("scale",)))
            sd[f"{t_prefix}.bias"] = np.asarray(_get(params, f_path + ("bias",)))
            sd[f"{t_prefix}.running_mean"] = np.asarray(
                _get(stats, f_path + ("mean",))
            )
            sd[f"{t_prefix}.running_var"] = np.asarray(
                _get(stats, f_path + ("var",))
            )
            sd[f"{t_prefix}.num_batches_tracked"] = np.asarray(0)
    return sd


def load_pth_variables(path, trilinear=True):
    """Load a reference ``.pth`` checkpoint into Flax variables.

    Uses torch (CPU) for unpickling, matching
    ``torch.load(map_location=device)`` at reference inference.py:421.
    """
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_variables(state_dict, trilinear=trilinear)


def save_pth_checkpoint(path, variables, trilinear=True):
    """Export Flax variables as a reference-loadable ``.pth`` state_dict."""
    import torch

    sd = variables_to_torch_state_dict(variables, trilinear=trilinear)
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)


def fold_batchnorm(variables, trilinear=True, eps=1e-5):
    """Fold eval-mode BatchNorm into the preceding conv kernel/bias.

    Eval BatchNorm (reference unet3d.py:142-149 semantics) is the affine
    map ``y = (x - mean) * scale / sqrt(var + eps) + bn_bias``; applied to
    a conv output it is exactly equivalent to scaling the conv kernel's
    output channels by ``g = scale / sqrt(var + eps)`` and replacing the
    bias with ``(bias - mean) * g + bn_bias``. Returns ``{"params": ...}``
    for a ``UNet3D(fused_bn=True)`` module: same conv tree, BN entries
    dropped, all folding done in float64 then cast back to float32 so the
    folded float32 path stays within ~1e-6 of the unfolded one.
    """
    def _to_np(node):
        if isinstance(node, dict):
            return {k: _to_np(v) for k, v in node.items()}
        return np.asarray(node)

    params = variables["params"]
    stats = variables["batch_stats"]
    folded = _to_np(params)

    for t_prefix, f_path, kind in _layout(trilinear):
        if kind != "bn":
            continue
        conv_path = f_path[:-1] + (
            "conv1" if f_path[-1] == "bn1" else "conv2",
        )
        scale = np.asarray(_get(params, f_path + ("scale",)), np.float64)
        bn_bias = np.asarray(_get(params, f_path + ("bias",)), np.float64)
        mean = np.asarray(_get(stats, f_path + ("mean",)), np.float64)
        var = np.asarray(_get(stats, f_path + ("var",)), np.float64)
        g = scale / np.sqrt(var + eps)

        kernel = np.asarray(_get(folded, conv_path + ("kernel",)), np.float64)
        bias = np.asarray(_get(folded, conv_path + ("bias",)), np.float64)
        _set(folded, conv_path + ("kernel",), (kernel * g).astype(np.float32))
        _set(
            folded, conv_path + ("bias",),
            ((bias - mean) * g + bn_bias).astype(np.float32),
        )
        # Drop the BN param entry from the folded tree.
        parent = _get(folded, f_path[:-1]) if f_path[:-1] else folded
        parent.pop(f_path[-1], None)

    return {"params": folded}
