"""End-to-end inference pipeline: scan mesh -> fitted SMPL body.

Public-API parity with reference `src/inference_demo.py:12-131`:
  - bbox-center the scan (:19-34)
  - sample num_point surface points (:36-39)
  - network forward -> direction/magnitude/labels/confidence (:41-57)
  - vectors = direction * magnitude / scale; inner = points - vectors (:58-59)
  - marker extraction + two-stage LM SMPL fit (:62-64)
  - un-center the fitted mesh (:107-110) and export obj + smpl-info npz with
    the same schema (:113-127)
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from etch_tpu.body.smpl import SMPLModel, load_smpl, smpl_forward, synthetic_body_model
from etch_tpu.data.mesh import TriMesh, load_obj, save_obj
from etch_tpu.data.sampling import sample_surface
from etch_tpu.fit.markers import extract_markers
from etch_tpu.fit.smpl_fit import fit_smpl_params
from etch_tpu.body.smpl import marker_submodel
from etch_tpu.models.etch_net import EtchNet
from etch_tpu.utils.config import EtchConfig

GENDER_MODEL_PATHS = {
    # reference fit_SMPL.py:92-99
    "neutral": "datafolder/body_models/smpl/neutral/SMPL_NEUTRAL_10pc_rmchumpy.pkl",
    "female": "datafolder/body_models/smpl/female/SMPL_FEMALE_10pc.pkl",
    "male": "datafolder/body_models/smpl/male/SMPL_MALE_10pc.pkl",
}


def load_markerset(path: str) -> Dict[str, int]:
    with open(path, "r") as f:
        return json.load(f)


def load_body_model(
    gender: str = "neutral", root: str = ".", allow_synthetic: bool = False
) -> SMPLModel:
    path = os.path.join(root, GENDER_MODEL_PATHS[gender])
    if os.path.isfile(path):
        return load_smpl(path)
    if allow_synthetic:
        return synthetic_body_model(n_verts=6890)
    raise FileNotFoundError(
        f"SMPL body model not found at {path}; download the SMPL release pkls "
        f"into datafolder/body_models/ (same layout as the reference) or pass "
        f"allow_synthetic=True for smoke testing."
    )


def center_scan(mesh: TriMesh) -> Tuple[TriMesh, np.ndarray]:
    """bbox-center (reference inference_demo.py:19-34)."""
    vmin, vmax = mesh.bounds()
    center = (vmin + vmax) / 2.0
    out = mesh.copy()
    out.vertices = mesh.vertices - center
    return out, center


class InferencePipeline:
    """Loads params once, jit-compiles forward + fitting, runs scans."""

    def __init__(
        self,
        cfg: EtchConfig,
        params,
        batch_stats,
        body_model: SMPLModel,
        marker_vids: np.ndarray,
    ):
        self.cfg = cfg
        self.model = EtchNet(cfg=cfg)
        self.params = params
        self.batch_stats = batch_stats
        self.body_model = body_model
        self.marker_vids = np.asarray(marker_vids, np.int32)
        self.sub = marker_submodel(body_model, self.marker_vids)

        @jax.jit
        def _forward(variables, points):
            # params passed as arguments (not closure constants): embedding
            # weights as HLO constants slows lowering and bloats the program
            return self.model.apply(variables, points, train=False)

        self._forward = _forward
        self._variables = {"params": params, "batch_stats": batch_stats}

        @jax.jit
        def _predict_fit(variables, pts):
            # ONE device program for the whole serving step: forward ->
            # vectors/inner/labels -> marker extraction -> two-stage LM ->
            # SMPL forward.  The split predict()/fit() path issues ~10
            # separate dispatches per batch (each tiny eager jnp op is its
            # own tunnel roundtrip on the axon backend: jit_multiply /
            # jit_argmax / ... in the traces); serving loops should use
            # run_batch.
            results = self.model.apply(variables, pts, train=False)
            vectors = (results["direction"] * results["magnitude"]
                       / self.cfg.scale_magnitude)
            labels = jnp.argmax(results["part_labels"], axis=-1)
            inner = pts - vectors
            markers, valid = extract_markers(
                inner, labels, results["confidences"],
                num_markers=len(self.marker_vids),
            )
            fitp = fit_smpl_params(
                self.sub, markers, valid,
                steps_stage0=self.cfg.fit_steps_stage0,
                steps_stage1=self.cfg.fit_steps_stage1,
                lr_stage0=self.cfg.fit_lr_stage0,
                lr_stage1=self.cfg.fit_lr_stage1,
                num_betas=int(self.body_model.num_betas),
            )
            verts, joints = smpl_forward(
                self.body_model, fitp["betas"], fitp["pose"],
                fitp["global_orient"], fitp["transl"],
            )
            return {
                "vectors": vectors, "inner_points": inner,
                "part_labels": labels, "confidences": results["confidences"],
                "markers": markers, "markers_valid": valid,
                "fit_params": fitp, "verts": verts, "joints": joints,
            }

        self._predict_fit = _predict_fit

    def run_batch(self, points: np.ndarray):
        """Fused serving step: (B, N, 3) scan batch -> predictions + fitted
        SMPL, in a single device program (one dispatch per batch)."""
        return self._predict_fit(self._variables,
                                 jnp.asarray(points, jnp.float32))

    def predict(self, points: np.ndarray):
        """points: (B, N, 3) -> dict with vectors/labels/confidences/inner."""
        pts = jnp.asarray(points, jnp.float32)
        results = self._forward(self._variables, pts)
        vectors = (
            results["direction"] * results["magnitude"] / self.cfg.scale_magnitude
        )
        labels = jnp.argmax(results["part_labels"], axis=-1)
        inner = pts - vectors
        return {
            "vectors": vectors,
            "inner_points": inner,
            "part_labels": labels,
            "part_logits": results["part_labels"],
            "confidences": results["confidences"],
            "direction": results["direction"],
            "magnitude": results["magnitude"],
        }

    def fit(self, inner_points, part_labels, confidences):
        markers, valid = extract_markers(
            inner_points, part_labels, confidences,
            num_markers=len(self.marker_vids),
        )
        params = fit_smpl_params(
            self.sub, markers, valid,
            steps_stage0=self.cfg.fit_steps_stage0,
            steps_stage1=self.cfg.fit_steps_stage1,
            lr_stage0=self.cfg.fit_lr_stage0,
            lr_stage1=self.cfg.fit_lr_stage1,
            num_betas=int(self.body_model.num_betas),
        )
        verts, joints = smpl_forward(
            self.body_model, params["betas"], params["pose"],
            params["global_orient"], params["transl"],
        )
        return verts, params, markers, valid, joints

    def run_scan(
        self,
        scan_path: str,
        num_point: Optional[int] = None,
        seed: Optional[int] = None,
    ):
        """Full single-scan pipeline; returns a result dict (arrays numpy)."""
        num_point = num_point or self.cfg.num_point
        mesh = load_obj(scan_path)
        centered, center = center_scan(mesh)
        points, _ = sample_surface(centered, num_point, seed=seed)
        pred = self.predict(points[None].astype(np.float32))
        verts, params, markers, valid, joints = self.fit(
            pred["inner_points"], pred["part_labels"], pred["confidences"]
        )
        final_vertices = np.asarray(verts[0]) + center   # un-center
        return {
            "vertices": final_vertices,
            "faces": self.body_model.faces,
            "center": center,
            "points": points,
            "pred": {k: np.asarray(v[0]) for k, v in pred.items()},
            "markers": np.asarray(markers[0]),
            "valid_mask": np.asarray(valid[0]),
            "smpl_params": {k: np.asarray(v[0]) for k, v in params.items()},
            "joints": np.asarray(joints[0]),
        }

    def export(self, result, scan_path: str, output_folder: str):
        """Write obj + npz with the reference's schema
        (inference_demo.py:113-127)."""
        os.makedirs(output_folder, exist_ok=True)
        scan_name = os.path.splitext(os.path.basename(scan_path))[0]
        obj_path = os.path.join(output_folder, f"{scan_name}_pred_smpl.obj")
        save_obj(obj_path, TriMesh(result["vertices"], result["faces"]))
        pose = result["smpl_params"]["pose"].reshape(23, 3)
        npz_path = os.path.join(
            output_folder, f"{scan_name}_output_smpl_info.npz"
        )
        np.savez(
            npz_path,
            body_pose=pose[:21, :],
            hand_pose=pose[21:23, :],
            betas=result["smpl_params"]["betas"],
            global_orient=result["smpl_params"]["global_orient"],
            transl=result["smpl_params"]["transl"],
            joints=result["joints"],
        )
        return obj_path, npz_path


def build_pipeline(
    cfg: EtchConfig,
    markerset: Dict[str, int],
    checkpoint_path: Optional[str] = None,
    gender: str = "neutral",
    datafolder_root: str = ".",
    allow_synthetic_body: bool = False,
    rng_seed: int = 0,
) -> InferencePipeline:
    """Construct the pipeline, loading params from an orbax/msgpack checkpoint
    or initializing randomly (for smoke tests and benchmarking)."""
    model = EtchNet(cfg=cfg)
    if checkpoint_path is not None:
        from etch_tpu.train.checkpoint import restore_params, tree_signature

        # expected param-tree signature via eval_shape: free (no compute),
        # lets restore_params reject an old-architecture checkpoint with an
        # explicit message instead of an obscure flax apply error
        example = jnp.zeros((1, cfg.num_point, 3), jnp.float32)
        shapes = jax.eval_shape(
            lambda r, p: model.init(r, p, train=False),
            jax.random.PRNGKey(0), example,
        )
        params, batch_stats = restore_params(
            checkpoint_path,
            expected_signature=tree_signature(shapes["params"]),
        )
    else:
        example = jnp.zeros((1, cfg.num_point, 3), jnp.float32)
        # jitted init: eager init is op-by-op over the axon tunnel
        variables = jax.jit(lambda r, p: model.init(r, p, train=False))(
            jax.random.PRNGKey(rng_seed), example
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
    body = load_body_model(
        gender, root=datafolder_root, allow_synthetic=allow_synthetic_body
    )
    vids = np.asarray(list(markerset.values()), np.int32)
    if body.num_verts <= int(vids.max()):
        # synthetic smoke-test body: remap marker ids into range
        vids = (vids % body.num_verts).astype(np.int32)
    return InferencePipeline(cfg, params, batch_stats, body, vids)
