import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
from bench import bench_pack_config, make_batches
from lanegcn_tpu.config import Config, relation_names, band_shift
from lanegcn_tpu.ops import masked_gather, scatter_add
from lanegcn_tpu.ops.table_gather import stacked_table_gather
from lanegcn_tpu.models.map_net import LaneConvStack

config = Config(pack=bench_pack_config(256))
batches, _ = make_batches(config, 1, 256)
g = batches[0].graph
names = relation_names(config.model.num_scales)
N = g.ctrs.shape[0]; C = 128
rng = np.random.RandomState(0)
feat = jnp.asarray(rng.randn(N, C)*0.1, jnp.bfloat16)
w = jnp.asarray(rng.randn(len(names), C, C)*0.05, jnp.bfloat16)
tbl = jnp.stack([g.tables[nm] for nm in names])
print(f"# N={N}", flush=True)

def timed(name, fn, *args, iters=30, grad=False):
    if grad:
        f0 = fn
        fn = jax.grad(lambda *a: jnp.sum(f0(*a).astype(jnp.float32)**2))
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(iters): out = jfn(*args)
    _ = float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    print(f"{name:40s} {(time.time()-t0)/iters*1e3:8.2f} ms", flush=True)

# full one layer via LaneConvStack num_layers=1
stack = LaneConvStack(config.model, num_layers=1, dtype=jnp.bfloat16)
params = stack.init(jax.random.PRNGKey(0), feat, g.edges, g.bands, tbl_dictify:=g.tables, g.table_inv)["params"]
timed("full layer fwd", lambda f: stack.apply({"params": params}, f, g.edges, g.bands, g.tables, g.table_inv), feat)
timed("full layer grad", lambda f: stack.apply({"params": params}, f, g.edges, g.bands, g.tables, g.table_inv), feat, grad=True)

timed("table gather [14,N,C]", lambda f: stacked_table_gather(f, tbl, g.table_inv.u, g.table_inv.v), feat)
timed("table gather grad", lambda f: stacked_table_gather(f, tbl, g.table_inv.u, g.table_inv.v), feat, grad=True)

def band_stack(f):
    rows = [jnp.where(g.bands[nm][:, None], jnp.roll(f, -band_shift(nm), 0), 0) if nm in g.bands else jnp.zeros_like(f) for nm in names]
    return jnp.stack(rows, 0)
timed("band stack [14,N,C]", band_stack, feat)
def full_xs_einsum(f):
    xs = stacked_table_gather(f, tbl, g.table_inv.u, g.table_inv.v).astype(jnp.bfloat16) + band_stack(f)
    return jnp.einsum("rnc,rcd->nd", xs, w, preferred_element_type=jnp.bfloat16)
timed("xs build + einsum fwd", full_xs_einsum, feat)
timed("xs build + einsum grad", full_xs_einsum, feat, grad=True)

def residue(f):
    temp = jnp.zeros_like(f)
    msgs, dsts, msks = [], [], []
    for r, nm in enumerate(names):
        e = g.edges[nm]
        src = masked_gather(f, e.v, e.mask)
        msgs.append(jnp.matmul(src, w[r], preferred_element_type=jnp.bfloat16))
        dsts.append(e.u); msks.append(e.mask)
    return scatter_add(jnp.concatenate(msgs), jnp.concatenate(dsts), N, mask=jnp.concatenate(msks), out=temp)
timed("residue combined scatter fwd", residue, feat)
timed("residue combined scatter grad", residue, feat, grad=True)

from lanegcn_tpu.models.layers import GroupNorm, Linear, Dense
import flax.linen as nn
class Tail(nn.Module):
    @nn.compact
    def __call__(self, x):
        y = nn.relu(GroupNorm(name="n")(x))
        y = Linear(128, act=False, dtype=jnp.bfloat16, name="l")(y)
        return nn.relu(y + x)
tail = Tail()
tp = tail.init(jax.random.PRNGKey(0), feat)["params"]
timed("GN+relu+linear+res tail fwd", lambda f: tail.apply({"params": tp}, f), feat)
timed("tail grad", lambda f: tail.apply({"params": tp}, f), feat, grad=True)
timed("ctr dense fwd", lambda f: jnp.matmul(f, w[0], preferred_element_type=jnp.bfloat16), feat)
