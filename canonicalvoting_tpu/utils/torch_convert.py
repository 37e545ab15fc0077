"""PyTorch (MinkowskiEngine) checkpoint -> Flax params converter.

Maps the reference's ``model.state_dict()`` layout
(reference train_joint.py:291 saves raw state dicts; the published
``pretrained/joint.pth`` / ``pretrained/separate/<cat>.pth`` follow it, and
the SUN RGB-D checkpoint nests under ``['model_state_dict']``,
sunrgbd/brnetcanon.py:167) onto this framework's parameter tree, enabling
parity evaluation without retraining.

Key correspondences (ME module attr -> torch key -> flax path):
  conv0p1s1.kernel (K, Cin, Cout)      -> params/conv0p1s1/kernel
  bn0.bn.{weight,bias}                 -> params/bn0/{scale,bias}
  bn0.bn.running_{mean,var}            -> batch_stats/bn0/{mean,var}
  blockB.J.conv1.kernel                -> params/blockB_J/conv1/kernel
  blockB.J.norm1.bn.*                  -> params/blockB_J/norm1/*
  blockB.J.downsample.0.kernel         -> params/blockB_J/downsample_conv/kernel
  blockB.J.downsample.1.bn.*           -> params/blockB_J/downsample_norm/*
  convtr4p16s2.kernel                  -> params/convtr4p16s2/kernel
  final.{kernel,bias}                  -> params/final/{kernel,bias}

ME kernels are stored (kernel_volume, Cin, Cout) with the hypercube offsets
enumerated x-fastest — identical to ops/coords.kernel_offsets — so kernels
transfer without permutation. kernel_size=1 convs are stored (Cin, Cout) by
ME; we insert the leading K=1 axis.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _to_numpy(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _assign(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_state_dict(state_dict: Dict[str, "np.ndarray"]):
    """Convert a reference state_dict to (params, batch_stats) pytrees."""
    params: Dict = {}
    batch_stats: Dict = {}

    block_re = re.compile(r"^(block\d+)\.(\d+)\.(.*)$")

    for key, value in state_dict.items():
        if key.endswith("num_batches_tracked"):
            continue
        v = _to_numpy(value)
        m = block_re.match(key)
        if m:
            module = f"{m.group(1)}_{m.group(2)}"
            rest = m.group(3)
        else:
            module, _, rest = key.partition(".")

        # downsample.0 = conv, downsample.1 = bn (utils/resnet.py:127-134)
        rest = rest.replace("downsample.0", "downsample_conv")
        rest = rest.replace("downsample.1", "downsample_norm")

        parts = rest.split(".")
        if parts[-2:-1] == ["bn"] or "bn" in parts:
            # BatchNorm leaf
            leaf = parts[-1]
            sub = [p for p in parts[:-1] if p != "bn"]
            path = [module] + sub
            if leaf == "weight":
                _assign(params, path + ["scale"], v.astype(np.float32))
            elif leaf == "bias":
                _assign(params, path + ["bias"], v.astype(np.float32))
            elif leaf == "running_mean":
                _assign(batch_stats, path + ["mean"], v.astype(np.float32))
            elif leaf == "running_var":
                _assign(batch_stats, path + ["var"], v.astype(np.float32))
            continue

        leaf = parts[-1]
        sub = parts[:-1]
        path = [module] + sub
        if leaf == "kernel":
            if v.ndim == 2:  # kernel_size=1 convs stored (Cin, Cout)
                v = v[None]
            _assign(params, path + ["kernel"], v.astype(np.float32))
        elif leaf == "bias":
            _assign(params, path + ["bias"], v.astype(np.float32))
        else:
            raise KeyError(f"unrecognized checkpoint key: {key}")

    return params, batch_stats


def load_torch_checkpoint(path: str):
    """Load a .pth file (torch required) and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "model_state_dict" in sd:  # SUN RGB-D layout (brnetcanon.py:167)
        sd = sd["model_state_dict"]
    return convert_state_dict(sd)


def reference_state_dict_template(variables) -> Dict[str, np.ndarray]:
    """Inverse mapping: emit a torch-style state dict (numpy values) from our
    variables — used for round-trip tests and for exporting checkpoints in
    the reference's format."""
    out = {}

    def walk(tree, prefix, is_stats):
        for k, v in tree.items():
            if isinstance(v, dict):
                mod = k
                m = re.match(r"^(block\d+)_(\d+)$", mod)
                if m:
                    mod = f"{m.group(1)}.{m.group(2)}"
                mod = mod.replace("downsample_conv", "downsample.0")
                mod = mod.replace("downsample_norm", "downsample.1")
                walk(v, prefix + mod + ".", is_stats)
            else:
                v = np.asarray(v)
                name = k
                p = prefix
                # norm layers: insert ".bn." and rename leaves
                if name in ("scale", "bias") and _looks_like_norm(prefix):
                    leaf = "weight" if name == "scale" else "bias"
                    out[p + "bn." + leaf] = v
                elif name in ("mean", "var"):
                    leaf = "running_mean" if name == "mean" else "running_var"
                    out[p + "bn." + leaf] = v
                elif name == "kernel":
                    out[p + "kernel"] = v[0] if v.shape[0] == 1 else v
                else:
                    out[p + name] = v

    def _looks_like_norm(prefix):
        stripped = prefix.rstrip(".")
        last = stripped.split(".")[-1]
        return last.startswith("bn") or last.startswith("norm") or \
            stripped.endswith("downsample.1") or last.startswith("bntr")

    walk(variables.get("params", {}), "", False)
    walk(variables.get("batch_stats", {}), "", True)
    return out
