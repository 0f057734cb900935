import jax, jax.numpy as jnp, numpy as np, time
from comfyui_propainter_nodes_tpu.config import PipelineConfig
from comfyui_propainter_nodes_tpu.pipeline.stages import Pipeline
from comfyui_propainter_nodes_tpu.utils import weights as wz
t, h, w = 24, 360, 640
cfg = PipelineConfig(process_size=(w, h))
pipe = Pipeline(wz.get_params("raft", allow_random=True),
                wz.get_params("flow_completion", allow_random=True),
                wz.get_params("inpaint_generator", allow_random=True), cfg)
rng = np.random.default_rng(0)
frames = jnp.asarray(rng.uniform(-1, 1, (1, t, h, w, 3)).astype(np.float32))
masks = jnp.zeros((1, t, h, w, 1)).at[:, :, 150:210, 280:360].set(1.0)
orig = jnp.asarray(rng.uniform(0, 255, (t, h, w, 3)).astype(np.float32))
def force(x): return [float(jnp.sum(l.astype(jnp.float32))) for l in jax.tree.leaves(x)]
def timed(name, fn):
    out = fn(); force(out)
    t0 = time.perf_counter(); out = fn(); force(out)
    print(f"{name}: {time.perf_counter()-t0:.2f}s", flush=True)
    return out
gt = timed("compute_flow", lambda: pipe.compute_flow(frames))
pf = timed("complete_flow", lambda: pipe.complete_flow(gt, masks))
up = timed("image_propagation", lambda: pipe.image_propagation(frames, masks, pf))
co = timed("feature_propagation", lambda: pipe.feature_propagation(up[0], up[1], masks, pf, orig))
