"""Inference demo CLI (reference src/inference_demo.py parity: same flags,
same output files)."""

from __future__ import annotations

import argparse
import os

from etch_tpu.cli.common import load_markerset
from etch_tpu.pipeline import build_pipeline
from etch_tpu.utils.config import EtchConfig


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scan_path", type=str, required=True)
    p.add_argument(
        "--gender", type=str, default="neutral",
        choices=["neutral", "male", "female"],
    )
    p.add_argument("--model_path", type=str, default="")
    p.add_argument(
        "--markerset_path",
        default="datafolder/useful_data_4d-dress/superset_smpl.json", type=str,
    )
    p.add_argument("--output_folder", type=str, default="output")
    p.add_argument("--num_point", type=int, default=5000)
    p.add_argument("--scale_magnitude", type=int, default=10)
    p.add_argument("--EPN_input_radius", type=float, default=0.4)
    p.add_argument("--EPN_layer_num", type=int, default=2)
    p.add_argument("--datafolder_root", type=str, default=".")
    p.add_argument(
        "--allow_synthetic_body", action="store_true",
        help="smoke-test without SMPL pkls (random body; results meaningless)",
    )
    args = p.parse_args(argv)

    cfg = EtchConfig(
        num_point=args.num_point,
        epn_input_radius=args.EPN_input_radius,
        epn_layer_num=args.EPN_layer_num,
        scale_magnitude=float(args.scale_magnitude),
    )
    markerset = load_markerset(args.markerset_path)
    pipe = build_pipeline(
        cfg,
        markerset,
        checkpoint_path=args.model_path or None,
        gender=args.gender,
        datafolder_root=args.datafolder_root,
        allow_synthetic_body=args.allow_synthetic_body,
    )
    result = pipe.run_scan(args.scan_path)
    obj_path, npz_path = pipe.export(result, args.scan_path, args.output_folder)
    print(
        f"Predicted SMPL mesh saved to: {obj_path}, smpl info saved to: {npz_path}"
    )


if __name__ == "__main__":
    main()
