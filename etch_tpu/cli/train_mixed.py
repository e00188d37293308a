"""All-in-One mixed-dataset training CLI (reference src/train_mixed.py parity).

Concatenates 4D-Dress + Generative + CAPE datasets with bbox-centered scans
and random y-axis rotation augmentation (GT_dataloader_mixed.py:176-199),
optional dynamic label/confidence regeneration from predicted inner points
(train_mixed.py:124-158,493-498), per-step scalar logging and per-epoch
checkpoints.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.cli.common import add_model_args, config_from_args, load_markerset
from etch_tpu.data.dataset import ConcatDataset, DatasetPaths, GTDataset, batch_iterator
from etch_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from etch_tpu.train.checkpoint import save_train_state
from etch_tpu.train.state import (
    create_train_state,
    make_train_step,
    make_train_step_dynamic,
)
from etch_tpu.utils.logging import MetricLogger


def main(argv=None):
    p = argparse.ArgumentParser()
    add_model_args(p)
    p.add_argument(
        "--dataset_spec", type=str, nargs="+", required=True,
        help="one or more 'scan_dir:smpl_dir:infopoints_dir[:ids_pkl]' specs",
    )
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--direction_w", type=float, default=1.0)
    p.add_argument("--magnitude_w", type=float, default=1.0)
    p.add_argument("--part_label_w", type=float, default=1.0)
    p.add_argument("--confidence_w", type=float, default=1.0)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--use_dynamic_label_confidence", action="store_true")
    p.add_argument("--no_augment", action="store_true")
    p.add_argument("--output_folder", type=str, default=None)
    p.add_argument("--i", type=str, default=None)
    args = p.parse_args(argv)

    cfg = config_from_args(args)
    if args.output_folder is None:
        name = (
            f"mixed_EPN_layer_{cfg.epn_layer_num}_radius_{cfg.epn_input_radius}"
            f"_num_point_{cfg.num_point}"
        )
        if args.i:
            name += f"_{args.i}"
        args.output_folder = os.path.join("all_experiments/experiments", name)
    os.makedirs(args.output_folder, exist_ok=True)
    with open(os.path.join(args.output_folder, "training_args.json"), "w") as f:
        json.dump(vars(args), f, indent=4, default=str)

    markerset = load_markerset(args.markerset_path)
    marker_vids = list(markerset.values())

    datasets = []
    for spec in args.dataset_spec:
        parts = spec.split(":")
        scan_dir, smpl_dir, info_dir = parts[:3]
        ids_pkl = parts[3] if len(parts) > 3 else None
        datasets.append(
            GTDataset(
                DatasetPaths(
                    scan_dir=scan_dir, smpl_dir=smpl_dir,
                    infopoints_dir=info_dir, activated_ids_path=ids_pkl,
                ),
                num_point=cfg.num_point,
                marker_vertex_ids=marker_vids,
                seed=cfg.seed,
                center=True,
                augment_rotation=not args.no_augment,
                include_marker_positions=args.use_dynamic_label_confidence,
            )
        )
    dataset = ConcatDataset(datasets)
    print(f"Num of data (mixed): {len(dataset)}")

    mesh = make_mesh()
    rng = jax.random.PRNGKey(cfg.seed)
    example = jnp.zeros((1, cfg.num_point, 3), jnp.float32)
    model, state, tx = create_train_state(cfg, rng, example)
    state = replicate(mesh, state)
    if args.use_dynamic_label_confidence:
        train_step = make_train_step_dynamic(model, tx, cfg)
        array_keys = ("hitpts", "vectors", "markers_positions")
    else:
        train_step = make_train_step(model, tx, cfg)
        array_keys = ("hitpts", "vectors", "confidences", "labels")

    logger = MetricLogger(os.path.join(args.output_folder, "log_all"))
    global_step = 0
    for epoch in range(cfg.epochs):
        epoch_losses = defaultdict(float)
        nb = 0
        t0 = time.time()
        for batch in batch_iterator(
            dataset, cfg.batch_size, shuffle=True, seed=cfg.seed + epoch,
            num_workers=args.num_workers,
        ):
            arrays = {k: batch[k] for k in array_keys if k in batch}
            if not args.use_dynamic_label_confidence:
                arrays["confidences"] = batch["confidences"]
                arrays["labels"] = batch["labels"]
            arrays = shard_batch(mesh, arrays)
            state, losses = train_step(state, arrays)
            nb += 1
            global_step += 1
            # device-side accumulation, one fetch per epoch (see cli/train.py)
            for k, v in losses.items():
                epoch_losses[k] = epoch_losses[k] + v
        epoch_losses = {
            k: float(v) / max(nb, 1)
            for k, v in jax.device_get(dict(epoch_losses)).items()
        }
        epoch_losses["epoch_time_s"] = time.time() - t0
        logger.log(epoch, epoch_losses)
        print(f"epoch {epoch}: " + ", ".join(
            f"{k}={v:.5f}" for k, v in epoch_losses.items()
        ))
        save_train_state(
            os.path.join(args.output_folder, "checkpoints"), epoch, state,
            config_json=cfg.to_json(),
        )
    logger.plot()


if __name__ == "__main__":
    main()
