import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from lanegcn_tpu.ops.pallas_band_conv import band_conv

N, C, J = 81920, 128, 12
shifts = tuple([-1,-2,-4,-8,-16,-32,1,2,4,8,16,32])
rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(N, C).astype(np.float32), jnp.bfloat16)
masks_np = (rng.rand(J, N) < 0.6)
for j, s in enumerate(shifts):
    if s > 0: masks_np[j, N-s:] = False
    else: masks_np[j, :(-s)] = False
masks = jnp.asarray(masks_np.astype(np.float32), jnp.bfloat16)
w = jnp.asarray(rng.randn(J, C, C).astype(np.float32) * 0.1, jnp.bfloat16)

def einsum_ref(f, m, ww):
    xs = jnp.stack([jnp.where(m[j][:, None] > 0, jnp.roll(f, -s, 0), 0) for j, s in enumerate(shifts)])
    return jnp.einsum("rnc,rcd->nd", xs, ww, preferred_element_type=jnp.bfloat16)

def timed(name, fn, *args, iters=30, grad=False):
    if grad:
        f0 = fn
        fn = jax.grad(lambda *a: jnp.sum(f0(*a).astype(jnp.float32)**2), argnums=(0, 2))
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters): out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    print(f"{name:34s} {(time.time()-t0)/iters*1e3:8.2f} ms", flush=True)

k = lambda f, m, ww: band_conv(f, m, ww, shifts, False)
a = np.asarray(k(feat, masks, w), np.float32)
b = np.asarray(einsum_ref(feat, masks, w), np.float32)
print("fwd parity max|d| =", float(np.max(np.abs(a - b))), flush=True)
timed("pallas band_conv fwd", k, feat, masks, w)
timed("einsum path fwd", einsum_ref, feat, masks, w)
timed("pallas band_conv fwd+bwd", k, feat, masks, w, grad=True)
timed("einsum path fwd+bwd", einsum_ref, feat, masks, w, grad=True)
