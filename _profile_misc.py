import jax, jax.numpy as jnp, numpy as np, time
def force(x): return float(jnp.sum(x.astype(jnp.float32)))
# 1. tunnel round-trip for trivial call
f = jax.jit(lambda x: x + 1.0)
a = jnp.ones((8, 128))
force(f(a))
t0 = time.perf_counter()
for _ in range(10): force(f(a))
print(f"per-call roundtrip (trivial jit + 4B fetch): {(time.perf_counter()-t0)/10*1e3:.1f} ms", flush=True)
# 2. transfer 66MB vs 17MB
big = jnp.ones((24, 360, 640, 3), jnp.float32); force(big)
t0 = time.perf_counter(); _ = np.asarray(big); print(f"fetch 66MB f32: {time.perf_counter()-t0:.2f}s", flush=True)
small = big.astype(jnp.uint8); force(small.astype(jnp.float32))
t0 = time.perf_counter(); _ = np.asarray(small); print(f"fetch 17MB u8: {time.perf_counter()-t0:.2f}s", flush=True)

# 3. raft bf16
from comfyui_propainter_nodes_tpu.models import raft as jraft
from comfyui_propainter_nodes_tpu.utils import weights as wz
rng = np.random.default_rng(0)
B, h, w = 12, 360, 640
im1 = jnp.asarray(rng.uniform(-1,1,(B,h,w,3)).astype(np.float32))
im2 = jnp.asarray(rng.uniform(-1,1,(B,h,w,3)).astype(np.float32))
pb = {k: jnp.asarray(v, jnp.bfloat16) for k, v in wz.get_params("raft", allow_random=True).items()}
fb16 = jax.jit(lambda a, b: jraft.raft_forward(pb, a, b, iters=20))
out = fb16(im1, im2); force(out)
t0 = time.perf_counter(); out = fb16(im1, im2); force(out)
print(f"raft 20it bf16: {time.perf_counter()-t0:.2f}s", flush=True)

# 4. feature window decomposition at bench shape
from comfyui_propainter_nodes_tpu.models import propainter as jpp
p = {k: jnp.asarray(v, jnp.bfloat16) for k, v in wz.get_params("inpaint_generator", allow_random=True).items()}
b, l_t, n_ref = 1, 11, 8
t_all = l_t + n_ref
fr = jnp.asarray(rng.uniform(-1,1,(b,t_all,h,w,3)).astype(np.float32)).astype(jnp.bfloat16)
mk = (jnp.zeros((b,t_all,h,w,1)).at[:, :, 150:210, 280:360].set(1.0)).astype(jnp.bfloat16)
fl = jnp.zeros((b,l_t-1,h,w,2), jnp.bfloat16)
full = jax.jit(lambda a,bb,c,d,e: jpp.inpaint_generator_forward(p, a, bb, c, d, e, l_t))
out = full(fr, fl, fl, mk, mk); force(out)
t0 = time.perf_counter(); out = full(fr, fl, fl, mk, mk); force(out)
print(f"inpaint full window (19 frames): {time.perf_counter()-t0:.2f}s", flush=True)
enc = jax.jit(lambda a: jpp.encoder(p, a.reshape(b*t_all, h, w, 5)))
ei = jnp.concatenate([fr, mk, mk], axis=-1)
out = enc(ei); force(out)
t0 = time.perf_counter(); out = enc(ei); force(out)
print(f"  encoder (19 frames): {time.perf_counter()-t0:.2f}s", flush=True)
h4, w4 = h//4, w//4
lf = jnp.asarray(rng.standard_normal((b, l_t, h4, w4, 128)).astype(np.float32)).astype(jnp.bfloat16)
fl4 = jnp.zeros((b, l_t-1, h4, w4, 2), jnp.bfloat16)
mk4 = jnp.zeros((b, l_t, h4, w4, 2), jnp.bfloat16)
propm = jax.jit(lambda a, f1, f2, m: jpp.bidirectional_propagation_feature(p, a, f1, f2, m))
out = propm(lf, fl4, fl4, mk4); force(out)
t0 = time.perf_counter(); out = propm(lf, fl4, fl4, mk4); force(out)
print(f"  feature prop (11 frames): {time.perf_counter()-t0:.2f}s", flush=True)
