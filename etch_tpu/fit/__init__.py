from etch_tpu.fit.markers import extract_markers  # noqa: F401
from etch_tpu.fit.lm import levenberg_marquardt  # noqa: F401
from etch_tpu.fit.smpl_fit import fit_smpl  # noqa: F401
