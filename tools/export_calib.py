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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/calib_ckpt/checkpoint_latest.msgpack")
    ap.add_argument("--out", default="calib/elic_united_q2.f16.msgpack")
    args = ap.parse_args()

    with open(args.ckpt, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    params = raw.get("params", raw)

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
