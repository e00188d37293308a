"""Evaluation CLI (reference src/eval.py parity): per-sample debug exports,
per-batch SMPL fitting grouped by gender, V2V scoring into v2v_score.txt."""

from __future__ import annotations

import argparse
import os

import numpy as np

from etch_tpu.cli.common import add_data_args, add_model_args, config_from_args, load_markerset
from etch_tpu.data.dataset import DatasetPaths, GTDataset, batch_iterator
from etch_tpu.data.mesh import TriMesh, load_obj, save_obj, save_points_with_color, save_points_with_vector
from etch_tpu.pipeline import build_pipeline

# fixed label->color shuffle for visualization parity (reference eval.py:66-69)
_SHUFFLE = [75, 0, 70, 22, 12, 56, 10, 18, 4, 67, 61, 64, 53, 73, 62, 66, 33,
            78, 54, 72, 11, 30, 40, 28, 9, 65, 5, 39, 31, 35, 45, 44, 16, 42,
            34, 7, 49, 82, 19, 83, 25, 47, 13, 24, 3, 17, 38, 8, 68, 6, 55,
            36, 77, 85, 43, 50, 46, 84, 15, 69, 27, 41, 58, 26, 48, 76, 57,
            32, 81, 59, 63, 79, 37, 29, 1, 52, 21, 2, 23, 80, 74, 20, 60, 71,
            14, 51]


def shuffle_label(labels: np.ndarray) -> np.ndarray:
    return np.asarray(_SHUFFLE)[labels]


def _viridis(x: np.ndarray) -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt.get_cmap("viridis")(x)[:, :3]


def main(argv=None):
    p = argparse.ArgumentParser()
    add_model_args(p)
    add_data_args(p)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--i", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--datafolder_root", type=str, default=".")
    p.add_argument("--allow_synthetic_body", action="store_true")
    # reference eval.py exports ~10 debug plys per sample; default OFF here
    # so a plain eval run measures V2V without paying the file IO
    p.add_argument("--save_debug", action=argparse.BooleanOptionalAction,
                   default=False)
    args = p.parse_args(argv)
    # eval default split (reference eval.py:273)
    if args.activated_ids_path.endswith("train_ids.pkl"):
        args.activated_ids_path = (
            "datafolder/useful_data_4d-dress/val_ids_sampled_ratio10.pkl"
        )

    cfg = config_from_args(args)
    output_folder = os.path.join(
        "all_experiments/experiments", f"eval_outputs_{args.i or 'default'}"
    )
    os.makedirs(output_folder, exist_ok=True)

    markerset = load_markerset(args.markerset_path)
    marker_vids = list(markerset.values())

    dataset = GTDataset(
        DatasetPaths(
            scan_dir=args.scan_dir,
            smpl_dir=args.smpl_dir,
            infopoints_dir=args.infopoints_dir,
            activated_ids_path=args.activated_ids_path,
        ),
        num_point=cfg.num_point,
        marker_vertex_ids=marker_vids,
        seed=cfg.seed,
    )

    pipes = {}

    def pipe_for(gender):
        if gender not in pipes:
            pipes[gender] = build_pipeline(
                cfg, markerset, checkpoint_path=args.model_path,
                gender=gender, datafolder_root=args.datafolder_root,
                allow_synthetic_body=args.allow_synthetic_body,
            )
        return pipes[gender]

    score_path = os.path.join(output_folder, "v2v_score.txt")
    if os.path.exists(score_path):
        os.remove(score_path)

    total_v2v, n_samples = 0.0, 0
    for batch in batch_iterator(
        dataset, args.batch_size, shuffle=False, drop_last=False,
        num_workers=args.num_workers,
    ):
        B = batch["hitpts"].shape[0]
        # forward with any pipeline (params identical across genders)
        pipe = pipe_for(batch["gender"][0])
        pred = pipe.predict(batch["hitpts"])

        # per-sample debug exports (reference eval.py:136-179)
        if args.save_debug:
            for j in range(B):
                id_ = batch["id"][j]
                d = os.path.join(output_folder, id_)
                os.makedirs(d, exist_ok=True)
                hp = batch["hitpts"][j]
                pv = np.asarray(pred["vectors"][j])
                gl = batch["labels"][j]
                pl = np.asarray(pred["part_labels"][j])
                np.savez(
                    os.path.join(d, f"tightness_vectors_info_{id_}.npz"),
                    hitpts=hp, pred_vectors=pv,
                    pred_part_labels=pl,
                    pred_confidences=np.asarray(pred["confidences"][j]),
                    gt_vectors=batch["vectors"][j],
                    gt_labels=gl,
                    gt_confidences=batch["confidences"][j],
                )
                save_points_with_vector(
                    hp, pv, os.path.join(d, f"hitpts_pred_vectors_{id_}.ply")
                )
                save_points_with_vector(
                    hp, batch["vectors"][j],
                    os.path.join(d, f"hitpts_gt_vectors_{id_}.ply"),
                )
                L = len(marker_vids)
                save_points_with_color(
                    hp, _viridis(shuffle_label(gl) / (L - 1)),
                    os.path.join(d, f"hitpts_gt_part_labels_{id_}.ply"),
                )
                save_points_with_color(
                    hp, _viridis(shuffle_label(pl) / (L - 1)),
                    os.path.join(d, f"hitpts_pred_part_labels_{id_}.ply"),
                )
                save_points_with_color(
                    hp - pv,
                    _viridis(shuffle_label(pl) / (L - 1)),
                    os.path.join(d, f"pred_inner_points_pred_part_labels_{id_}.ply"),
                )

        # fit grouped by gender (reference eval.py:185-211): one vmapped
        # batched fit per gender present in the batch, not B serial B=1 fits
        by_gender = {}
        for j in range(B):
            by_gender.setdefault(batch["gender"][j], []).append(j)
        fits = {}
        for gender, idxs in by_gender.items():
            gp = pipe_for(gender)
            sel = np.asarray(idxs)
            verts_g, params_g, markers_g, valid_g, joints_g = gp.fit(
                pred["inner_points"][sel],
                pred["part_labels"][sel],
                pred["confidences"][sel],
            )
            for pos, j in enumerate(idxs):
                fits[j] = (gp, verts_g[pos],
                           {k: v[pos] for k, v in params_g.items()},
                           valid_g[pos], joints_g[pos])

        for j in range(B):
            gp, verts_j, params_j, valid_j, joints_j = fits[j]
            id_ = batch["id"][j]
            d = os.path.join(output_folder, id_)
            os.makedirs(d, exist_ok=True)

            final_verts = np.asarray(verts_j)
            save_obj(
                os.path.join(d, f"forwarded_smpl_mesh_on_pred_{id_}.obj"),
                TriMesh(final_verts, gp.body_model.faces),
            )

            gt_path = os.path.join(args.smpl_dir, id_, f"mesh_smpl_{id_}.obj")
            if os.path.exists(gt_path):
                gt_mesh = load_obj(gt_path)
                if len(gt_mesh.vertices) == len(final_verts):
                    v2v = float(
                        np.mean(np.linalg.norm(gt_mesh.vertices - final_verts, axis=1))
                    )
                    total_v2v += v2v
                    n_samples += 1
                    print(f"{id_} v2v: {v2v}")
                    full = (
                        int(np.asarray(valid_j).sum()) == valid_j.shape[0]
                    )
                    with open(score_path, "a") as f:
                        f.write(
                            f"{id_}: {v2v}"
                            + ("" if full else "  attention, the valid mask is not full")
                            + "\n"
                        )

            pose = np.asarray(params_j["pose"]).reshape(23, 3)
            np.savez(
                os.path.join(d, f"output_smpl_info_{id_}.npz"),
                body_pose=pose[:21], hand_pose=pose[21:23],
                betas=np.asarray(params_j["betas"]),
                global_orient=np.asarray(params_j["global_orient"]),
                transl=np.asarray(params_j["transl"]),
                joints=np.asarray(joints_j),
            )

    if n_samples:
        print(f"average v2v: {total_v2v / n_samples}")
        with open(score_path, "a") as f:
            f.write("==========\n")
            f.write(f"average v2v: {total_v2v / n_samples}\n")
            f.write(f"total v2v: {total_v2v}\n")
            f.write(f"sample num: {n_samples}\n")


if __name__ == "__main__":
    main()
