import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from lanegcn_tpu.ops.pallas_band_conv import band_conv

N, C, J = 512, 128, 12
shifts = tuple([-1,-2,-4,-8,-16,-32,1,2,4,8,16,32])
rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(N, C).astype(np.float32))
masks = jnp.asarray((rng.rand(J, N) < 0.6).astype(np.float32))
w = jnp.asarray(rng.randn(J, C, C).astype(np.float32) * 0.1)

def ref(feat, masks, w):
    out = jnp.zeros((N, C))
    for j, s in enumerate(shifts):
        rows = jnp.where(masks[j][:, None] > 0, jnp.roll(feat, -s, 0), 0)
        out += rows @ w[j]
    return out

# zero out mask edges that would wrap (match kernel's zero-pad semantics)
mm = np.asarray(masks).copy()
for j, s in enumerate(shifts):
    if s > 0: mm[j, N-s:] = 0
    else: mm[j, :(-s)] = 0
masks = jnp.asarray(mm)

r = ref(feat, masks, w)
out = band_conv(feat, masks, w, shifts, True)
print("fwd max|d| =", float(jnp.max(jnp.abs(out - r))))

def loss_k(f, m, ww): return jnp.sum(band_conv(f, m, ww, shifts, True)**2)
def loss_r(f, m, ww): return jnp.sum(ref(f, m, ww)**2)
gk = jax.grad(loss_k, argnums=(0, 2))(feat, masks, w)
gr = jax.grad(loss_r, argnums=(0, 2))(feat, masks, w)
print("dfeat max|d| =", float(jnp.max(jnp.abs(gk[0] - gr[0]))))
print("dw max|d| =", float(jnp.max(jnp.abs(gk[1] - gr[1]))))
