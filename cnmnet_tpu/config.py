"""Typed experiment configuration.

Replaces the reference's sacred + YAML + EasyDict stack (`train.py:36-61`,
`configs/config.yaml`) with plain dataclasses:

* defaults mirror `configs/config.yaml` (seed 123, 100 epochs, idepth_scale
  3.0, k_size 9, Adam lr 1e-4 wd 1e-5, 192x256, prob_weight 20, ...);
* ``load_config(yaml_path)`` reads a YAML file with the same nesting;
* ``apply_overrides(cfg, ["dataset.batch_size=5", ...])`` implements the
  reference CLI's dotted-override DSL (`README.md:44-58`) with typed parsing.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class SolverConfig:
    method: str = "adam"
    lr: float = 1e-4
    weight_decay: float = 1e-5
    # TPU extras
    grad_clip_norm: Optional[float] = None
    warmup_steps: int = 0


@dataclass
class DatasetConfig:
    root_dir: str = ""
    test_dir: str = ""
    list_filepath: str = ""
    test_list_filepath: str = ""  # held-out list (reference test.txt)
    batch_size: int = 1
    num_workers: int = 4
    image_width: int = 256
    image_height: int = 192
    view_num: int = 3
    interval: int = 10
    depth_scale: float = 5.0  # train-side depth clamp [0.1, 5.0] m
    max_planes: int = 20
    synthetic: bool = False  # procedural data (tests / benches without ScanNet)
    synthetic_size: int = 64
    wire_dtype: str = "float32"  # "uint8": raw RGB batches (4x smaller H2D
    # transfers); normalization folds into the compiled forward
    # (ops/images.prepare_images)


@dataclass
class ModelConfig:
    idepth_scale: float = 3.0
    num_planes: int = 64
    k_size: int = 9
    norm: str = "batch"
    compute_dtype: str = "float32"  # "bfloat16" on TPU for speed
    use_refiner: bool = True  # False: DepthNet-only staged pretraining
    remat: bool = False  # rematerialize DepthNet encoder stages in backward
    remat_stages: int = -1  # how many encoder stages (from the input side,
    # where activations are largest) to checkpoint when remat=True: -1 = all
    # five (the round-3 behavior); 1-5 = selective (e.g. 2 checkpoints only
    # the two high-resolution stages — most of the memory for a fraction of
    # the re-FLOPs). Ignored when remat=False.
    remat_refiner: bool = False  # also rematerialize the RefineNet (its
    # native-res activations bound the large-batch 480x640 train step)
    stride2: str = "conv"  # stride-2 conv impl (identical params/outputs):
    # "conv" = XLA strided conv; "s2d" = space-to-depth + dense stride-1
    # (measured slower at batch 8 — forward FLOP inflation); "psg" = plain
    # forward with a phase-split input-gradient custom VJP (avoids the
    # zero-dilated backward conv). See models/layers.py + RESULTS.md.
    cv_backend: Optional[str] = None  # kernel dispatch: None=auto, jnp, pallas
    sampling: str = "exact"  # cost-volume sampling convention; "torch"
    # reproduces the reference's era grid_sample (u*(S-1)/S) for imported
    # checkpoints (see kernels/dispatch.py)


@dataclass
class ParallelConfig:
    data_axis: int = -1  # -1: all devices on the data axis
    tile_axis: int = 1  # spatial tiling factor (H)
    # multi-host
    coordinator_address: Optional[str] = None
    num_processes: int = 1
    process_id: int = 0


@dataclass
class TrainConfig:
    seed: int = 123
    num_epochs: int = 100
    resume_dir: Optional[str] = None
    print_interval: int = 10
    checkpoint_dir: str = "checkpoints"
    ckpt_keep: int = 8  # orbax max_to_keep
    # steps between mid-epoch checkpoint saves; None derives the
    # reference's 8x/epoch cadence from the loader length
    # (`/root/reference/train.py:402-410`). Epoch-end + interrupt saves
    # always happen regardless.
    ckpt_interval: Optional[int] = None
    use_normal_loss: bool = True  # False = the `train_wo_normal` recipe
    use_normal_refined_by_planes: bool = True  # CNM vs raw GT normals
    curriculum_epochs: int = 5  # disparity-only epochs in train_wo_normal
    prob_weight: float = 20.0
    normal_weight: float = 0.8
    include_prob_map_loss: bool = False  # the reference logs it but excludes it
    # microbatches per optimizer step (gradient accumulation): the jitted
    # step folds the batch to [A, B/A, ...] and lax.scans the fwd+bwd,
    # averaging gradients — one Adam update per step, activation memory of
    # a B/A batch. Unlocks native-res effective batches past the HBM
    # activation wall (RESULTS.md batch-8 @ 480x640). BN batch statistics
    # are computed per microbatch (standard accumulation semantics).
    grad_accum: int = 1
    log_dir: str = "logs"
    steps_per_epoch: Optional[int] = None  # cap (for smoke runs)


@dataclass
class Config:
    solver: SolverConfig = field(default_factory=SolverConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)


def _from_dict(cls, data: dict):
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in data.items():
        if key not in names:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        f = names[key]
        if dataclasses.is_dataclass(f.type) or (
            isinstance(f.type, str) and f.type in _SECTION_TYPES
        ):
            sub_cls = _SECTION_TYPES.get(f.type, f.type) if isinstance(f.type, str) else f.type
            kwargs[key] = _from_dict(sub_cls, value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


_SECTION_TYPES = {
    "SolverConfig": SolverConfig,
    "DatasetConfig": DatasetConfig,
    "ModelConfig": ModelConfig,
    "ParallelConfig": ParallelConfig,
    "TrainConfig": TrainConfig,
}


def load_config(path: Optional[str] = None) -> Config:
    if path is None:
        return Config()
    import yaml

    with open(path) as f:
        data = yaml.safe_load(f) or {}
    return _from_dict(Config, data)


def _parse_value(text: str, current: Any) -> Any:
    if isinstance(current, bool):
        return text.lower() in ("1", "true", "yes")
    if current is None:
        if text.lower() in ("none", "null"):
            return None
        for caster in (int, float):
            try:
                return caster(text)
            except ValueError:
                pass
        return text
    if isinstance(current, int) and not isinstance(current, bool):
        return int(text)
    if isinstance(current, float):
        return float(text)
    return text


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply ``section.key=value`` strings (typed by the current value)."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must be key=value, got {item!r}")
        dotted, text = item.split("=", 1)
        parts = dotted.split(".")
        obj = cfg
        for p in parts[:-1]:
            obj = getattr(obj, p)
        leaf = parts[-1]
        if not hasattr(obj, leaf):
            raise KeyError(f"unknown config key {dotted!r}")
        setattr(obj, leaf, _parse_value(text, getattr(obj, leaf)))
    return cfg


def to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)
