from etch_tpu.body.smpl import SMPLModel, load_smpl, synthetic_body_model  # noqa: F401
