"""Probe: is the synthesis program's in-context slowdown a whole-program
layout-assignment pathology?

Evidence motivating this: every op inside jit__synth16 runs 2-5x slower
than the same op isolated under default layouts (the [16,256,320,192] 1x1
conv: 7.1 ms in-program vs 1.3 ms isolated; the 3x3 C96 RB convs: 3.1 vs
1.6 — docs/PERF.md round 3).  If XLA's global layout choices are the
cause, a version of g_s split into per-block jits (default row-major
layouts materialize at every boundary) should beat the fused program
despite the extra dispatches + boundary copies.

Run on the real TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python tools/prof_synth_split.py
"""
import os, time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
import jax, jax.numpy as jnp, numpy as np
from rgbdc_tpu.utils.cache import enable_compile_cache

enable_compile_cache()
import flax.linen as nn
from rgbdc_tpu.nn.layers import AttentionBlock, ResidualBottleneck, deconv
from rgbdc_tpu.nn.attention import BiSPF

B, YH, YW, M, N = 16, 32, 40, 320, 192
DTYPE = jnp.bfloat16


class Stage(nn.Module):
    """One g_s stage: BiSPF fusion + 3 RBs + deconv (matches
    SynthesisTransformEXcross's loop body at stage != 1/2)."""

    n: int
    out_r: int
    out_d: int
    attn: bool = False

    @nn.compact
    def __call__(self, rgb, depth):
        n = self.n
        if self.attn:
            rgb = AttentionBlock(n)(rgb)
            depth = AttentionBlock(n)(depth)
        rgb_f, depth_f = BiSPF(n)(rgb, depth)
        rgb = jnp.concatenate([rgb, rgb_f], axis=-1)
        depth = jnp.concatenate([depth, depth_f], axis=-1)
        rgb = ResidualBottleneck(2 * n, out=n)(rgb)
        depth = ResidualBottleneck(2 * n, out=n)(depth)
        for _ in range(2):
            rgb = ResidualBottleneck(n)(rgb)
            depth = ResidualBottleneck(n)(depth)
        rgb = deconv(self.out_r)(rgb)
        depth = deconv(self.out_d)(depth)
        return rgb, depth


class Head(nn.Module):
    @nn.compact
    def __call__(self, rgb, depth):
        rgb = AttentionBlock(M)(rgb)
        depth = AttentionBlock(M)(depth)
        return deconv(N)(rgb), deconv(N)(depth)


class Full(nn.Module):
    @nn.compact
    def __call__(self, rgb, depth):
        rgb, depth = Head()(rgb, depth)
        rgb, depth = Stage(N, N, N)(rgb, depth)
        rgb, depth = Stage(N, N, N, attn=True)(rgb, depth)
        rgb, depth = Stage(N, 3, 1)(rgb, depth)
        return rgb, depth


rng = jax.random.PRNGKey(0)
ry = jnp.asarray(np.random.default_rng(0).standard_normal((B, YH, YW, M)), DTYPE)
dy = jnp.asarray(np.random.default_rng(1).standard_normal((B, YH, YW, M)), DTYPE)

full = Full()
vf = jax.tree.map(lambda a: a.astype(DTYPE), full.init(rng, ry, dy))
f_full = jax.jit(lambda v, r, d: full.apply(v, r, d))

mods = [Head(), Stage(N, N, N), Stage(N, N, N, attn=True), Stage(N, 3, 1)]
vs, fs = [], []
r, d = ry, dy
for m in mods:
    v = jax.tree.map(lambda a: a.astype(DTYPE), m.init(rng, r, d))
    vs.append(v)
    fs.append(jax.jit(lambda v, r, d, _m=m: _m.apply(v, r, d)))
    r, d = m.apply(v, r, d)


def sync1(x):
    _ = np.asarray(x[:1, :1, :1, :1])


def t_full():
    r, d = f_full(vf, ry, dy)
    sync1(r)


def t_split():
    r, d = ry, dy
    for f, v in zip(fs, vs):
        r, d = f(v, r, d)
    sync1(r)


for name, fn in (("full", t_full), ("split", t_split), ("full", t_full),
                 ("split", t_split)):
    fn()
    ts = []
    for _ in range(4):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    print(f"g_s {name}: min {min(ts)*1e3:.0f} ms  all {[round(t*1e3) for t in ts]}",
          flush=True)
