"""One-shot importer: reference PyTorch checkpoint -> canonical params pytree.

The reference ships ``ckpts/best_model_dns3.tar`` with dict keys
``{epoch, optimizer, scheduler, model}`` (388 tensors, SURVEY.md §2.1).  This
module maps that state dict onto our canonical layouts:

- Conv2d OIHW (O, I/g, kT, kF)        -> HWIO (kT, kF, I/g, O)
- ConvTranspose2d (I, O, kT, kF)      -> HWIO flipped (kT, kF, I, O) with the
  kernel reversed in both spatial dims -- the same canonicalisation the
  reference applies for its streaming model (conversion/convert.py:36-51),
  done here once for *all* paths (offline == streaming by construction)
- 1x1 convs / Linear                  -> (C_in, C_out) matmul matrices
- Conv1d depthwise (C, 1, k)          -> (k, C)
- PReLU weight (1,)                   -> scalar

torch is only needed to deserialize; everything downstream is numpy/JAX.
Loaders tolerate ``state_dict``/``model_state_dict``/``model`` key variants
and ``module.`` DDP prefixes (mirrors output_tests.py:36-44).
"""

from __future__ import annotations

import numpy as np


def _load_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        state = (
            ckpt.get("state_dict")
            or ckpt.get("model_state_dict")
            or ckpt.get("model")
            or ckpt
        )
    else:
        state = ckpt
    out = {}
    for k, v in state.items():
        k = k.removeprefix("module.")
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def _conv_oihw(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_iohw(w: np.ndarray) -> np.ndarray:
    w = np.transpose(w, (2, 3, 0, 1))  # (kT, kF, I, O)
    return w[::-1, ::-1].copy()


def _pw_conv(w: np.ndarray) -> np.ndarray:
    # Conv2d (O, I, 1, 1) or Conv1d (O, I, 1) -> (I, O)
    return w.reshape(w.shape[0], w.shape[1]).T.copy()


def _pw_deconv(w: np.ndarray) -> np.ndarray:
    # ConvTranspose2d (I, O, 1, 1) -> (I, O)
    return w.reshape(w.shape[0], w.shape[1]).copy()


def _bn(sd: dict, prefix: str) -> dict:
    return {
        "gamma": sd.pop(f"{prefix}.weight"),
        "beta": sd.pop(f"{prefix}.bias"),
        "running_mean": sd.pop(f"{prefix}.running_mean"),
        "running_var": sd.pop(f"{prefix}.running_var"),
    }


def _prelu(sd: dict, key: str) -> dict:
    return {"alpha": sd.pop(key).reshape(())}


def _conv_block(sd: dict, prefix: str, deconv: bool, is_last: bool) -> dict:
    w = sd.pop(f"{prefix}.conv.weight")
    p = {
        "conv": {
            "w": _deconv_iohw(w) if deconv else _conv_oihw(w),
            "b": sd.pop(f"{prefix}.conv.bias"),
        },
        "bn": _bn(sd, f"{prefix}.bn"),
    }
    if not is_last:
        p["act"] = _prelu(sd, f"{prefix}.act.weight")
    return p


def _gt_conv_block(sd: dict, prefix: str, deconv: bool) -> dict:
    pw = _pw_deconv if deconv else _pw_conv
    w_depth = sd.pop(f"{prefix}.depth_conv.weight")
    return {
        "point_conv1": {
            "w": pw(sd.pop(f"{prefix}.point_conv1.weight")),
            "b": sd.pop(f"{prefix}.point_conv1.bias"),
        },
        "point_bn1": _bn(sd, f"{prefix}.point_bn1"),
        "point_act": _prelu(sd, f"{prefix}.point_act.weight"),
        "depth_conv": {
            "w": _deconv_iohw(w_depth) if deconv else _conv_oihw(w_depth),
            "b": sd.pop(f"{prefix}.depth_conv.bias"),
        },
        "depth_bn": _bn(sd, f"{prefix}.depth_bn"),
        "depth_act": _prelu(sd, f"{prefix}.depth_act.weight"),
        "point_conv2": {
            "w": pw(sd.pop(f"{prefix}.point_conv2.weight")),
            "b": sd.pop(f"{prefix}.point_conv2.bias"),
        },
        "point_bn2": _bn(sd, f"{prefix}.point_bn2"),
        "tra": {
            # Conv1d depthwise (C,1,k) -> (k, C)
            "depth_w": sd.pop(f"{prefix}.tra.depth_conv.weight")[:, 0, :].T.copy(),
            "depth_b": sd.pop(f"{prefix}.tra.depth_conv.bias"),
            "point_w": _pw_conv(sd.pop(f"{prefix}.tra.point_conv.weight")),
            "point_b": sd.pop(f"{prefix}.tra.point_conv.bias"),
        },
    }


def _tcn(sd: dict, prefix: str) -> dict:
    return {
        "conv1": {
            "w": _pw_conv(sd.pop(f"{prefix}.conv1.weight")),
            "b": sd.pop(f"{prefix}.conv1.bias"),
        },
        "bn1": _bn(sd, f"{prefix}.bn1"),
        "act1": _prelu(sd, f"{prefix}.act1.weight"),
        "conv2": {
            "w": _conv_oihw(sd.pop(f"{prefix}.conv2.weight")),
            "b": sd.pop(f"{prefix}.conv2.bias"),
        },
        "bn2": _bn(sd, f"{prefix}.bn2"),
        "act2": _prelu(sd, f"{prefix}.act2.weight"),
        "conv3": {
            "w": _pw_conv(sd.pop(f"{prefix}.conv3.weight")),
            "b": sd.pop(f"{prefix}.conv3.bias"),
        },
        "bn3": _bn(sd, f"{prefix}.bn3"),
        "act3": _prelu(sd, f"{prefix}.act3.weight"),
    }


def import_reference_checkpoint(path: str) -> dict:
    """Load a reference GTCRN-Micro checkpoint into a canonical params pytree.

    Raises if any tensor in the source state dict goes unconsumed (the same
    strictness as the reference's convert_to_stream, conversion/convert.py:54).
    """
    import jax.numpy as jnp

    sd = _load_state_dict(path)
    # drop BN step counters -- not used by our BN
    for k in [k for k in sd if k.endswith("num_batches_tracked")]:
        sd.pop(k)

    params: dict = {}
    params["erb"] = {
        "bm_w": sd.pop("erb.erb_fc.weight").T.copy(),
        "bs_w": sd.pop("erb.ierb_fc.weight").T.copy(),
    }
    params["sfe"] = {"depth_conv": {"w": _conv_oihw(sd.pop("sfe.depth_conv.weight"))}}

    enc = {}
    enc["en0"] = _conv_block(sd, "encoder.en_convs.0", deconv=False, is_last=False)
    enc["en1"] = _conv_block(sd, "encoder.en_convs.1", deconv=False, is_last=False)
    for i in (2, 3, 4):
        enc[f"en{i}"] = _gt_conv_block(sd, f"encoder.en_convs.{i}", deconv=False)
    params["encoder"] = enc

    for g in ("gtcn1", "gtcn2"):
        params[g] = {
            f"block{i}": _tcn(sd, f"{g}.blocks.{i}") for i in range(4)
        }

    dec = {}
    for i in (0, 1, 2):
        dec[f"de{i}"] = _gt_conv_block(sd, f"decoder.de_convs.{i}", deconv=True)
    dec["de3"] = _conv_block(sd, "decoder.de_convs.3", deconv=True, is_last=False)
    dec["de4"] = _conv_block(sd, "decoder.de_convs.4", deconv=True, is_last=True)
    params["decoder"] = dec

    if sd:
        raise ValueError(f"unconsumed reference tensors: {sorted(sd)}")

    import jax

    return jax.tree.map(lambda x: jnp.asarray(np.ascontiguousarray(x)), params)
