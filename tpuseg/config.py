"""Dataclass config + CLI — the flag system the reference lacks.

The reference hard-codes every knob in entry scripts
(`/root/reference/train.py:34-37`, `example.py`, `flask_app.py:15-18`;
SURVEY.md §5 'Config / flag system').  tpuseg centralizes the same
semantic knobs (model/data/train/infer sections) in one dataclass tree
with `--section.field value` CLI overrides and JSON round-trip.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple


@dataclass
class ModelConfig:
    name: str = "unet3d"            # tpuseg.models.build_model key
    num_classes: int = 2
    image_channel: int = 1
    features: int = 16
    dropout: float = 0.2


@dataclass
class DataConfig:
    train_csv: str = ""
    train_aug_csv: str = ""         # optional augmented manifest (train.py:19)
    val_csv: str = ""
    image_size: Tuple[int, ...] = (112, 112, 128)   # (x, y, z) or (h, w)
    batch_size: int = 1
    binary_labels: bool = False     # y[y!=0]=1 (modelUnet.py:574)
    online_augment: bool = False    # device-side random affine per batch
    shuffle_seed: int = 0


@dataclass
class TrainConfig:
    epochs: int = 100
    lr: float = 1e-3
    optimizer: str = "adam"
    loss_name: str = "MutilDiceLoss"
    alpha: Optional[List[float]] = None
    gamma: float = 2.0
    accuracy_name: str = "dice"
    grad_clip: Optional[float] = None
    early_stop_patience: Optional[int] = None
    model_dir: str = "log/run"
    resume: bool = False
    mesh_data: int = -1             # -1: all devices data-parallel
    mesh_model: int = 1
    mesh_space: int = 1             # >1: z-sharded spatial training (tasks/spatial.py)
    packed_stem: bool = False       # UNet3d/VNet3d/STUNet3d/ResUNet3d:
    #                                 space-to-depth packed finest level(s)
    #                                 (models/*_packed.py) — exact grads,
    #                                 measured 2.6x faster train step.  With
    #                                 mesh_space>1 the composition runs for
    #                                 UNet3d only (models/unet_packed_sp.py:
    #                                 halo'd packed convs + psum'd GN); for
    #                                 the other models spatial training's
    #                                 z-sharded halo convs operate in the
    #                                 fine voxel domain, while the
    #                                 packed graph never materializes fine
    #                                 activations past the input.  The
    #                                 trainer factory raises on non-UNet
    #                                 packed x spatial combos.
    profile: bool = False           # jax.profiler trace of a few steps
    compute_dtype: str = "float32"  # "bfloat16": mixed-precision train —
    #                                 f32 master params/optimizer/loss,
    #                                 forward+backward in bf16.  Measured
    #                                 (benchmarks/bf16_packed_train_probe.py,
    #                                 BASELINE.md round-4 ledger): 1.13x on
    #                                 the PACKED UNet3d step (the 128-lane
    #                                 packed layout removes the GN-promotion
    #                                 converts + backward layout copies that
    #                                 made fine-domain bf16 training SLOWER,
    #                                 see "bf16 training" in BASELINE.md).
    #                                 Loss trajectory tracks f32 to ~2e-4.


@dataclass
class InferConfig:
    model_dir: str = ""
    new_size: Tuple[int, int, int] = (112, 112, 128)
    patch_size: Optional[Tuple[int, int, int]] = None   # sliding-window
    new_spacing: Optional[Tuple[float, float, float]] = None
    batch_size: int = 8
    overlap: float = 0.5
    threshold: float = 0.5


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    infer: InferConfig = field(default_factory=InferConfig)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        return cls(
            model=ModelConfig(**raw.get("model", {})),
            data=DataConfig(**{k: _detuple(v) for k, v in raw.get("data", {}).items()}),
            train=TrainConfig(**raw.get("train", {})),
            infer=InferConfig(**{k: _detuple(v) for k, v in raw.get("infer", {}).items()}),
        )


def _detuple(v):
    return tuple(v) if isinstance(v, list) and v and isinstance(v[0], (int, float)) else v


def parse_cli(argv: Optional[Sequence[str]] = None, base: Optional[Config] = None) -> Config:
    """`--config file.json` plus `--section.field value` overrides."""
    cfg = base or Config()
    parser = argparse.ArgumentParser(description="tpuseg")
    parser.add_argument("--config", type=str, default=None)
    known, rest = parser.parse_known_args(argv)
    if known.config:
        with open(known.config) as f:
            cfg = Config.from_json(f.read())

    i = 0
    while i < len(rest):
        arg = rest[i]
        assert arg.startswith("--") and "." in arg, f"bad override: {arg}"
        path = arg[2:]
        if "=" in path:
            path, value = path.split("=", 1)
            i += 1
        else:
            value = rest[i + 1]
            i += 2
        section_name, field_name = path.split(".", 1)
        section = getattr(cfg, section_name)
        current = getattr(section, field_name)
        f_type = type(current)
        if current is None:
            parsed = json.loads(value)
        elif f_type is bool:
            parsed = value.lower() in ("1", "true", "yes")
        elif f_type in (int, float, str):
            parsed = f_type(value)
        else:
            parsed = _detuple(json.loads(value))
        setattr(section, field_name, parsed)
    return cfg
