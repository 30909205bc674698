"""Export the calibration checkpoint for committing: params-only, cast to
float16 (halves the artifact; the codec rebuilds CDF tables after load, and
enc/dec share programs, so the wire path stays bit-exact at any weight
precision).

Run:  python tools/export_calib.py --ckpt /tmp/calib_ckpt/checkpoint_latest.msgpack \
          --out calib/elic_united_q2.f16.msgpack
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def fit_eb_quantiles(params, eb_names, tail_mass=1e-9, n_filters=4):
    """Solve each entropy bottleneck's quantiles to their aux-loss fixed
    point by bisection: logits_cumulative(q) = [-t, 0, t] with
    t = log(2/tail_mass - 1).  The aux Adam path needs ~1e5 steps to walk
    quantiles to convergence (it moves them ~lr per step); the calibration
    run is far shorter, so the fixed point is computed here EXACTLY —
    logits_cumulative is monotone in its input by construction
    (softplus-reparameterized matrices, |tanh factors| < 1)."""
    import math

    from rgbdc_tpu.entropy.bottleneck import logits_cumulative_np

    t = math.log(2.0 / tail_mass - 1.0)
    targets = np.array([-t, 0.0, t])
    out = dict(params)
    for name in eb_names:
        eb = dict(params[name])
        c = np.asarray(eb["quantiles"]).shape[0]
        lo = np.full((c, 1, 3), -150.0)
        hi = np.full((c, 1, 3), 150.0)
        for _ in range(60):
            mid = (lo + hi) / 2
            val = logits_cumulative_np(eb, mid, n_filters=n_filters)
            go_hi = val < targets[None, None, :]
            lo = np.where(go_hi, mid, lo)
            hi = np.where(go_hi, hi, mid)
        q = ((lo + hi) / 2).astype(np.float32)
        resid = np.abs(
            logits_cumulative_np(eb, q.astype(np.float64), n_filters=n_filters)
            - targets[None, None, :]
        ).max()
        print(f"{name}: quantiles fitted, max |logits-target| = {resid:.3e}, "
              f"median range [{q[:,0,1].min():.2f}, {q[:,0,1].max():.2f}]")
        eb["quantiles"] = q
        out[name] = eb
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/calib_ckpt/checkpoint_latest.msgpack")
    ap.add_argument("--out", default="calib/elic_united_q2.f16.msgpack")
    ap.add_argument(
        "--fit-quantiles", nargs="*",
        default=["rgb_entropy_bottleneck", "depth_entropy_bottleneck"],
        help="EB param names whose quantiles get bisection-fitted (pass "
        "with no values to skip)",
    )
    args = ap.parse_args()

    with open(args.ckpt, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw.get("params", raw)
    if args.fit_quantiles:
        params = fit_eb_quantiles(params, args.fit_quantiles)

    def to_f16(x):
        arr = np.asarray(x)
        if arr.dtype == np.float32:
            return arr.astype(np.float16)
        return arr

    params16 = jax.tree.map(to_f16, params)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    data = serialization.to_bytes({"params": params16})
    with open(args.out, "wb") as f:
        f.write(data)
    n = sum(int(np.prod(np.asarray(p).shape)) for p in jax.tree_util.tree_leaves(params16))
    print(f"wrote {args.out}: {len(data)/1e6:.1f} MB, {n/1e6:.1f}M params")


def load_calib_params_device(path: str, params_template):
    """Load an f16 export straight onto the device: upload the f16 leaves
    (half the bytes — the tunnel h2d is the bottleneck at ~600 MB f32) and
    widen to the template dtypes ON DEVICE with a jitted cast."""
    import jax
    import jax.numpy as jnp

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw.get("params", raw)
    restored = serialization.from_state_dict(params_template, params)
    dev16 = jax.device_put(restored)
    dtypes = jax.tree.map(lambda t: np.dtype(t.dtype), params_template)
    cast = jax.jit(
        lambda tree: jax.tree.map(
            lambda x, dt: x.astype(jnp.dtype(dt)), tree, dtypes
        )
    )
    return cast(dev16)


def load_calib_params(path: str, params_template):
    """Load an f16 export back into a (f32) params template."""
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw.get("params", raw)

    def widen(t, x):
        arr = np.asarray(x)
        return arr.astype(np.asarray(t).dtype)

    flat_t, treedef = jax.tree_util.tree_flatten(params_template)
    restored = serialization.from_state_dict(params_template, params)
    flat_r = jax.tree_util.tree_leaves(restored)
    return jax.tree_util.tree_unflatten(
        treedef, [widen(t, x) for t, x in zip(flat_t, flat_r)]
    )


if __name__ == "__main__":
    main()
