"""Single-source configuration for the ETCH-TPU pipeline.

The reference duplicates hyperparameters across argparse in train/eval/infer
(`src/train.py:144-175`, `src/eval.py:271-289`) plus a yacs CfgNode for EPN
internals (`src/config/EPN_options.py:4-45`).  Here a single frozen dataclass
drives model construction, training and inference; CLI entry points parse
flags into it.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class EPNConfig:
    """EPN backbone hyperparameters (reference src/config/EPN_options.py:4-45
    and build_model defaults, src/models/so3net.py:36-48)."""

    kanchor: int = 60                 # icosahedral SO(3) anchors
    input_num: int = 1024             # nominal input size for ratio scaling
    search_radius: float = 0.4        # overridden by EtchConfig.epn_input_radius
    dropout_rate: float = 0.0
    initial_radius_ratio: float = 0.2
    sampling_ratio: float = 0.8
    sampling_density: float = 0.5
    kernel_multiplier: int = 2
    sigma_ratio: float = 0.5
    kernel_size: int = 1              # 1 -> 24 kernel points


@dataclasses.dataclass(frozen=True)
class EtchConfig:
    """Top-level pipeline configuration (defaults follow reference
    src/train.py:144-175)."""

    num_point: int = 5000             # points sampled per scan
    epn_input_radius: float = 0.4
    epn_layer_num: int = 2            # number of EPN blocks used (of 4)
    num_markers: int = 86             # superset_smpl.json marker count
    scale_magnitude: float = 10.0     # magnitude head predicts |v| * 10
    batch_size: int = 1
    lr: float = 1e-4
    epochs: int = 30
    seed: int = 1

    # ---- model width/depth knobs ------------------------------------------
    # Defaults are the reference production sizes (so3net.py:36-48,
    # pointtransformer_seg.py:262-268, direction_backbones.py:197-223).
    # Sharding correctness is width-independent, so the multi-chip dryrun and
    # the 8-vs-1-device equivalence test run on `EtchConfig.tiny()` instead of
    # paying a production-width compile on a 1-core CI host.
    epn_mlps: Optional[Tuple[Tuple[int, ...], ...]] = None  # None -> reference
    unet_planes_magnitude: Tuple[int, ...] = (64, 128, 256, 256, 512)
    unet_planes_confidence: Tuple[int, ...] = (128, 128, 256, 256, 512)
    unet_blocks: Tuple[int, ...] = (2, 3, 4, 6, 3)
    unet_strides: Tuple[int, ...] = (1, 4, 4, 4, 4)
    unet_nsamples: Tuple[int, ...] = (8, 16, 16, 16, 16)
    dir_value_dim: int = 128
    dir_num_heads: int = 8
    dir_num_layers: int = 2
    dir_chunk: int = 2048

    # loss weights (src/train.py:168-171)
    direction_w: float = 1.0
    magnitude_w: float = 1.0
    part_label_w: float = 1.0
    confidence_w: float = 1.0

    # fitting budget (src/models/fit_SMPL.py:68)
    fit_steps_stage0: int = 30
    fit_steps_stage1: int = 50
    fit_lr_stage0: float = 0.5
    fit_lr_stage1: float = 0.2
    fit_damping: float = 0.01

    epn: EPNConfig = dataclasses.field(default_factory=EPNConfig)

    # dtype policy: params & norm statistics in f32; large contractions may
    # run in bf16 with f32 accumulation when `use_bfloat16` is on.
    use_bfloat16: bool = False

    def replace(self, **kw) -> "EtchConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "EtchConfig":
        d = json.loads(s)
        epn = EPNConfig(**d.pop("epn", {}))
        # JSON turns tuples into lists; restore hashable tuples so the flax
        # module treats the config as a static attribute.
        for f in dataclasses.fields(EtchConfig):
            if f.name in d and isinstance(d[f.name], list):
                d[f.name] = tuple(
                    tuple(x) if isinstance(x, list) else x for x in d[f.name]
                )
        return EtchConfig(epn=epn, **d)

    @staticmethod
    def tiny(num_point: int = 256, batch_size: int = 8, **kw) -> "EtchConfig":
        """Minimum-width config exercising every code path (EPN separable
        blocks, all 5 U-Net levels, dual confidence head, MHSA direction
        head).  Used by the multi-chip dryrun and the 8-vs-1-device
        equivalence test, where the statement under test (GSPMD sharding
        correctness) is independent of layer width."""
        defaults = dict(
            num_point=num_point,
            batch_size=batch_size,
            epn_mlps=((8, 8), (8, 8)),
            unet_planes_magnitude=(8, 16, 16, 16, 16),
            unet_planes_confidence=(8, 16, 16, 16, 16),
            unet_blocks=(1, 1, 1, 1, 1),
            unet_strides=(1, 4, 4, 4, 4),
            unet_nsamples=(4, 4, 4, 4, 4),
            dir_value_dim=16,
            dir_num_heads=2,
            dir_num_layers=1,
            dir_chunk=512,
            # small EPN neighbor schedule: nominal input_num drives the
            # n_neighbor arithmetic (backbone_plan), 128 keeps it ~8-16
            epn=EPNConfig(input_num=128),
        )
        defaults.update(kw)
        return EtchConfig(**defaults)


def backbone_plan(cfg: EtchConfig):
    """Compute the per-conv static plan of the EPN backbone.

    Mirrors the arithmetic of reference `src/models/so3net.py:36-133`
    (strides/radii/sigma/neighbor schedule incl. the input_num>1024 rescale
    at so3net.py:58-61), but emits a static list of layer descriptors so the
    whole network compiles with fixed shapes.

    Returns a list of blocks; each block is a list of conv descriptors dicts.
    """
    if cfg.epn_mlps is not None:
        mlps = [list(b) for b in cfg.epn_mlps][: cfg.epn_layer_num]
    else:
        mlps = [[32, 32], [64, 64], [128, 128], [256, 256]][: cfg.epn_layer_num]
    strides = [2, 2, 2, 2][: cfg.epn_layer_num]

    # NOTE: the schedule is driven by the *nominal* input_num from the EPN
    # config (1024), not the actual point count — the reference never wires
    # --num_point into opt.model.input_num (src/models/models_pointcloud.py:
    # 30-32 only overrides search_radius), so the >1024 rescale at
    # so3net.py:58-61 is dead in practice.  We keep the arithmetic for parity
    # but feed it the same nominal value.
    input_num = cfg.epn.input_num
    sampling_ratio = cfg.epn.sampling_ratio
    if input_num > 1024:
        sampling_ratio /= input_num / 1024
        strides[0] = int(2 * (input_num / 1024))

    input_radius = cfg.epn_input_radius
    n_layer = len(mlps)
    stride_current = 1
    stride_multipliers = [stride_current]
    for _ in range(n_layer):
        stride_current *= 2
        stride_multipliers.append(stride_current)

    num_centers = [int(input_num / m) for m in stride_multipliers]
    radius_ratio = [
        cfg.epn.initial_radius_ratio * m ** cfg.epn.sampling_density
        for m in stride_multipliers
    ]
    radii = [r * input_radius for r in radius_ratio]

    weighted_sigma = [cfg.epn.sigma_ratio * radii[0] ** 2]
    for idx, s in enumerate(strides):
        weighted_sigma.append(weighted_sigma[idx] * s)

    blocks = []
    dim_in = 1
    n_in = cfg.num_point  # actual point count entering the conv
    for i, block in enumerate(mlps):
        block_param = []
        for j, dim_out in enumerate(block):
            lazy_sample = i != 0 or j != 0
            neighbor = int(
                sampling_ratio * num_centers[i]
                * radius_ratio[i] ** (1 / cfg.epn.sampling_density)
            )
            if i == 0 and j == 0:
                # reference so3net.py:96; max(1,..) guards sub-1024 nominal
                # input_num (tiny configs) — the factor is >=1 for every
                # reference config (input_num defaults to 1024)
                neighbor *= max(1, int(input_num / 1024))
            neighbor *= 2  # stride_conv is always true (xyz_pooling=None)

            if j == 0:
                inter_stride = strides[i]
                nidx = i if i == 0 else i + 1
            else:
                inter_stride = 1
                nidx = i + 1

            n_out = -(-n_in // inter_stride)  # ceil
            block_param.append(dict(
                dim_in=dim_in, dim_out=dim_out,
                kernel_size=cfg.epn.kernel_size,
                stride=inter_stride,
                radius=radii[nidx],
                sigma=weighted_sigma[nidx],
                n_neighbor=neighbor,
                lazy_sample=lazy_sample,
                n_in=n_in, n_out=n_out,
                occupancy_input=(i == 0 and j == 0),
            ))
            dim_in = dim_out
            n_in = n_out
        blocks.append(block_param)
    return blocks
