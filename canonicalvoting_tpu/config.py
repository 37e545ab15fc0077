"""Configuration system.

Mirrors the reference Hydra config (reference: /root/reference/config/config.yaml)
key-for-key with identical defaults, implemented as plain dataclasses plus a
YAML loader and hydra-style ``key=value`` CLI overrides (including the
``category=a,b,c`` multirun sweep used by ``train_separate.py``).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml


@dataclass
class DataConfig:
    # Paths mirror reference config/config.yaml:1-9.
    scan2cad: str = "/path/to/full_annotations.json"
    scannet: str = "/data/ScanNetV2"
    train_split: str = "/path/to/scannetv2_train.txt"
    val_split: str = "/path/to/scannetv2_val.txt"
    train_segments: str = "/path/to/scan2cad/train/scan2cad_segments.pkl"
    val_segments: str = "/path/to/scan2cad/val/scan2cad_segments.pkl"
    gt_path: str = "/path/to/results_gt"
    scene_nn_root: str = "/path/to/scene_nn/root"


@dataclass
class OptConfig:
    # reference config/config.yaml:31-36
    learning_rate: float = 1e-3
    bn_decay_step: int = 20
    bn_decay_rate: float = 0.5
    lr_decay_steps: str = "80,120,160"
    lr_decay_rates: str = "0.1,0.1,0.1"


@dataclass
class TPUConfig:
    """TPU-specific knobs with no reference counterpart (new capabilities)."""

    # Static-shape capacity buckets for voxel counts (points are padded up to
    # the smallest bucket that fits; XLA recompiles once per bucket).
    point_buckets: tuple = (4096, 16384, 32768, 65536, 131072, 262144)
    # Vote-grid capacity (cells per axis). ScanNet at 0.03 m: largest scenes
    # are ~15 m -> ~512 cells. Grids are padded to this static shape.
    grid_capacity: tuple = (512, 192, 512)
    # Max boxes peeled per scene inside the jit while_loop.
    max_boxes: int = 64
    # Max objects / symmetry hypotheses per scene (separate training).
    max_objects: int = 64
    max_symmetry: int = 36
    # Compute dtype for the sparse-conv GEMMs ("bfloat16" or "float32").
    conv_dtype: str = "bfloat16"
    # Training backbone: "gather" (kernel-map gather-GEMM + scene
    # microbatching — the measured winner and the "auto" default; the
    # dense backward exceeds HBM at ScanNet scale even rematted,
    # RESULTS_r5.md) or "dense" (masked dense Conv3D, opt-in). Parameter
    # trees are identical either way.
    train_backbone: str = "auto"
    # Train memory/speed controls (measured A/B in RESULTS_r5.md):
    # per-block remat (recompute in the backward — a ~12% tax; only
    # needed when microbatching alone doesn't fit, e.g. the opt-in dense
    # backbone) and scene-at-a-time gradient accumulation (0 = whole
    # batch in one step; k = microbatches of k scenes, grads averaged,
    # one optimizer update per global batch — BN statistics then run per
    # microbatch). No whole-batch-3 backward fits 15.75 GB HBM at ScanNet
    # scale (gather 19.9 GB, dense 129.7 GB), so the loops resolve
    # microbatch "auto" -> 1 on TPU.
    train_remat: bool = False
    train_microbatch: int = 0  # 0 = off; "auto" in the loop -> 1 on TPU
    # Gather-backbone conv sites routed through the scatter->dense-conv->
    # gather MXU engine (ops/scatter_conv.py). Measured: "stem" (the
    # scalar-grid lane fold) wins 0.416 -> 0.436 steps/s; dense L0/L1 sub
    # convs LOSE 2.6x (full-grid FLOPs at ~1% occupancy) — keep "stem".
    train_dense_levels: str = "stem"
    # Mesh axis sizes for distributed runs; (1, 1) = single chip.
    mesh_data: int = 1
    mesh_model: int = 1
    # Rotation chunk size for the Hough-voting sweep (memory/latency knob).
    hv_rot_chunk: int = 4


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    # reference config/config.yaml:11-29
    scannet_res: float = 0.03
    num_workers: int = 10
    max_epoch: int = 160
    batch_size: int = 3
    log_scale: bool = True
    scale_factor: float = 1.0
    xyz_factor: float = 1.0
    augment_color: bool = False
    augment: bool = True
    start_epoch: int = 0
    xyz_component_weights: str = "1,1,1"
    weight_decay: float = 0.0
    use_xyz: bool = False
    category: str = "all"
    evaluate: bool = False
    opt: OptConfig = field(default_factory=OptConfig)
    tpu: TPUConfig = field(default_factory=TPUConfig)

    # --- derived helpers -------------------------------------------------
    @property
    def in_channels(self) -> int:
        return 6 if self.use_xyz else 3

    @property
    def xyz_weights(self):
        return [float(x) for x in self.xyz_component_weights.split(",")]

    @property
    def lr_decay_steps(self):
        return [int(x) for x in self.opt.lr_decay_steps.split(",")]

    @property
    def lr_decay_rates(self):
        return [float(x) for x in self.opt.lr_decay_rates.split(",")]


def _set_by_path(obj: Any, path: str, value: str) -> None:
    parts = path.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    name = parts[-1]
    current = getattr(obj, name)
    if isinstance(current, bool):
        value = value.lower() in ("1", "true", "yes", "on")
    elif isinstance(current, int):
        value = int(value)
    elif isinstance(current, float):
        value = float(value)
    elif isinstance(current, tuple):
        value = tuple(int(x) for x in value.strip("()").split(","))
    setattr(obj, name, value)


def _update_dataclass(obj: Any, d: dict) -> None:
    for k, v in d.items():
        if not hasattr(obj, k):
            continue
        current = getattr(obj, k)
        if dataclasses.is_dataclass(current) and isinstance(v, dict):
            _update_dataclass(current, v)
        else:
            setattr(obj, k, v)


def load_config(yaml_path: Optional[str] = None, overrides: Optional[list] = None) -> Config:
    """Build a Config from defaults, an optional YAML file, and CLI overrides.

    Overrides use hydra syntax: ``scannet_res=0.05 opt.learning_rate=1e-4``.
    """
    cfg = Config()
    if yaml_path is not None:
        with open(yaml_path) as f:
            loaded = yaml.safe_load(f) or {}
        _update_dataclass(cfg, loaded)
    for ov in overrides or []:
        if "=" not in ov:
            continue
        key, value = ov.split("=", 1)
        key = key.strip().lstrip("+")
        _set_by_path(cfg, key, value.strip())
    return cfg


def parse_cli(argv: list) -> tuple:
    """Split argv into (yaml_path, overrides, multirun categories or None).

    Supports the reference's multirun sweep ``category=a,b,c -m``
    (reference: README.md:79).
    """
    multirun = False
    overrides = []
    yaml_path = None
    for a in argv:
        if a in ("-m", "--multirun"):
            multirun = True
        elif a.startswith("--config="):
            yaml_path = a.split("=", 1)[1]
        else:
            overrides.append(a)
    categories = None
    if multirun:
        for ov in overrides:
            if ov.startswith("category="):
                categories = ov.split("=", 1)[1].split(",")
    return yaml_path, overrides, categories
