import time
import numpy as np
import jax
import jax.numpy as jnp
from gfplslam_tpu.config import Config, CameraParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import frame as frame_mod
from gfplslam_tpu.ops.pyramid import build_pyramid_padded
from gfplslam_tpu.ops.hamming import hamming_matrix

cam = CameraParams()
cfg = Config(camera=cam)
world = synthetic.make_world(n_frames=8, n_points=900, n_lines=90, seed=3, cam=cam)
pairs = [synthetic.render_frame(world, i, noise=1.5) for i in range(8)]
ils = jnp.stack([jnp.asarray(p[0]) for p in pairs])
irs = jnp.stack([jnp.asarray(p[1]) for p in pairs])
N = 8
fth = jnp.asarray(20.0)
fe = jax.jit(lambda a, b: frame_mod.process_stereo_pair(a, b, cfg, fth))
fe.lower(ils[0], irs[0]).compile()
print("flipped", flush=True)
rng = np.random.default_rng(7)
stacks = [(ils + jnp.asarray(rng.normal(0, 0.5, ils.shape).astype(np.float32)),
           irs + jnp.asarray(rng.normal(0, 0.5, irs.shape).astype(np.float32)))
          for _ in range(4)]

def scan_bench(name, body):
    @jax.jit
    def run(ls, rs):
        def step(c, ab):
            out = body(ab[0], ab[1])
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
            return c + s, ()
        tot, _ = jax.lax.scan(step, 0.0, (ls, rs))
        return tot
    jax.block_until_ready(run(*stacks[3]))
    t0 = time.perf_counter()
    for k in range(3):
        jax.block_until_ready(run(*stacks[k]))
    dt = (time.perf_counter() - t0) / 3 / N * 1000
    print(f"{name:46s} {dt:8.2f} ms/frame", flush=True)

scan_bench("FULL process_stereo_pair", lambda a, b: frame_mod.process_stereo_pair(a, b, cfg, fth))

def fe_det_only(a, b):
    feats = jax.vmap(lambda im: frame_mod.detect_camera_features(im, cfg, fth))(jnp.stack([a, b]))
    return feats
scan_bench("detect only x2 (pts+lines+lbd)", fe_det_only)

def fe_pts_stereo(a, b):
    feats = jax.vmap(lambda im: frame_mod.detect_camera_features(im, cfg, fth))(jnp.stack([a, b]))
    fl = jax.tree.map(lambda x: x[0], feats)
    fr = jax.tree.map(lambda x: x[1], feats)
    pyrs = jax.vmap(lambda im: build_pyramid_padded(im, cfg.orb.nlevels, cfg.orb.scale_factor))(jnp.stack([a, b]))
    return frame_mod.stereo_match_points(cam, cfg, fl, fr, pyrs[0], pyrs[1])
scan_bench("detect + point stereo(+subpix)", fe_pts_stereo)

def hamm_only(a, b):
    feats = jax.vmap(lambda im: frame_mod.detect_camera_features(im, cfg, fth))(jnp.stack([a, b]))
    fl = jax.tree.map(lambda x: x[0], feats)
    fr = jax.tree.map(lambda x: x[1], feats)
    return hamming_matrix(fl.pt_desc, fr.pt_desc, fl.pt_valid, fr.pt_valid)
scan_bench("detect + hamming 1024x1024", hamm_only)
