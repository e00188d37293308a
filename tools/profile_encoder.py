"""Per-conv EPN encoder timing + U-Net geometry breakdown on the real TPU.

Times EPNBackbone truncated after each conv (prefix plans) so per-conv cost
falls out by differencing, plus the standalone unet_geometry program and its
individual fps/knn levels.  Feeds the encoder-optimization work (round-1
VERDICT weak #2: encoder dominates at ~1.3% MFU).

Run:  python tools/profile_encoder.py
Env:  ETCH_PROF_BATCH (8), ETCH_PROF_POINTS (5000), ETCH_PROF_BF16 (1)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_etch_bench")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BATCH = int(os.environ.get("ETCH_PROF_BATCH", "8"))
NUM_POINT = int(os.environ.get("ETCH_PROF_POINTS", "5000"))
USE_BF16 = os.environ.get("ETCH_PROF_BF16", "1") == "1"
REPS = int(os.environ.get("ETCH_PROF_REPS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    from etch_tpu.models.etch_net import _freeze_plan
    from etch_tpu.nn.epn import EPNBackbone
    from etch_tpu.nn.point_transformer import unet_geometry
    from etch_tpu.ops import ball_query, fps, knn
    from etch_tpu.utils.config import EtchConfig, backbone_plan

    cfg = EtchConfig(num_point=NUM_POINT, batch_size=BATCH,
                     use_bfloat16=USE_BF16)
    rng = np.random.RandomState(0)
    z = rng.uniform(-0.9, 0.9, (BATCH, NUM_POINT))
    th = rng.uniform(0, 2 * np.pi, (BATCH, NUM_POINT))
    r = 0.15 + 0.03 * np.cos(3 * z)
    pts = jnp.asarray(
        np.stack([r * np.cos(th), r * np.sin(th), z], -1), jnp.float32
    )

    tiny = jax.jit(lambda x: x + 1)
    tiny(jnp.zeros(())).item()
    t0 = time.perf_counter()
    for _ in range(10):
        tiny(jnp.zeros(())).item()
    latency = (time.perf_counter() - t0) / 10
    print(f"tunnel latency {latency*1e3:.1f} ms")

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
            s = jax.tree.reduce(
                lambda a, x: a + jnp.sum(x[..., :1].astype(jnp.float32)),
                out, jnp.zeros(()))
            float(s)
        return max((time.perf_counter() - t0) / REPS - latency, 1e-9)

    # --- encoder prefixes ---
    full_plan = _freeze_plan(backbone_plan(cfg))
    flat = [c for b in full_plan for c in b]
    enc_dtype = jnp.bfloat16 if USE_BF16 else None
    prev = 0.0
    for k in range(1, len(flat) + 1):
        plan_k = (tuple(flat[:k]),)
        model = EPNBackbone(plan=plan_k, compute_dtype=enc_dtype)
        variables = model.init(jax.random.PRNGKey(0), pts[:1])

        @jax.jit
        def f(v, x, model=model):
            cloud, _ = model.apply(v, x)
            return cloud.feats

        t = timeit(f, variables, pts)
        c = flat[k - 1]
        print(f"encoder[:{k}] ({c.n_in}->{c.n_out}, C{c.dim_in}->{c.dim_out})"
              f": {t*1e3:8.2f} ms   (conv {k}: {(t-prev)*1e3:+8.2f} ms)")
        prev = t

    # --- U-Net geometry standalone + per-level ops ---
    @jax.jit
    def f_geom(x):
        return jax.tree.leaves(unet_geometry(x))[:4]

    t = timeit(f_geom, pts)
    print(f"unet_geometry (all levels):   {t*1e3:8.2f} ms")

    n = NUM_POINT
    xs = pts
    for lvl, (stride, ns) in enumerate(
        [(1, 8), (4, 16), (4, 16), (4, 16), (4, 16)]
    ):
        m = max(1, n // stride) if stride > 1 else n
        if stride > 1:
            sidx = jax.jit(lambda x, m=m: fps(x, m))(xs)
            ctr = jnp.take_along_axis(xs, sidx[..., None], axis=1)
        else:
            ctr = xs
        t_f = timeit(jax.jit(lambda x, m=m: fps(x, m)), xs) if stride > 1 else 0.0
        t_k = timeit(jax.jit(lambda c, x, ns=ns: knn(c, x, ns)), ctr, xs)
        print(f"  level {lvl}: n={n}->m={m}  fps {t_f*1e3:7.2f} ms   "
              f"knn(k={ns}) {t_k*1e3:7.2f} ms")
        xs, n = ctr, m

    # --- encoder query ops at conv shapes ---
    for (p_in, p_out, rad, nn_k) in [
        (5000, 2500, 0.4, 64), (2500, 2500, 0.8, 64),
        (2500, 1250, 0.8, 64), (1250, 1250, 1.6, 64),
    ]:
        x_in = pts[:, :p_in]
        s = jax.jit(lambda x, m=p_out: fps(x, m))(x_in)
        c = jnp.take_along_axis(x_in, s[..., None], axis=1)
        t_b = timeit(
            jax.jit(lambda c, x, r=rad, k=nn_k: ball_query(c, x, r, k)),
            c, x_in)
        print(f"  ball_query {p_in}x{p_out} r={rad} k={nn_k}: {t_b*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
