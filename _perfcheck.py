import time
import numpy as np
import jax
import jax.numpy as jnp
from gfplslam_tpu.config import Config, CameraParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import frame as frame_mod
from gfplslam_tpu.ops import lsd as lsd_ops

cam = CameraParams()
cfg = Config(camera=cam)
world = synthetic.make_world(n_frames=8, n_points=900, n_lines=90, seed=3, cam=cam)
pairs = [synthetic.render_frame(world, i, noise=1.5) for i in range(8)]
ils = jnp.stack([jnp.asarray(p[0]) for p in pairs])
irs = jnp.stack([jnp.asarray(p[1]) for p in pairs])
N = 8
fth = jnp.asarray(20.0)

# flip regime
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
    print(f"{name:40s} {dt:8.2f} ms/frame", flush=True)

v2 = lambda f: (lambda a, b: jax.vmap(f)(jnp.stack([a, b])))
scan_bench("NEW lsd x2", v2(lambda im: lsd_ops.detect_lines(im, n_out=512)))
scan_bench("FULL process_stereo_pair", lambda a, b: frame_mod.process_stereo_pair(a, b, cfg, fth))

from gfplslam_tpu.ops import fast as fast_ops, orb as orb_ops, lbd as lbd_ops
from gfplslam_tpu.ops.pyramid import build_pyramid_padded, gaussian_blur, level_shapes
def detect_points_only(img):
    nlv = cfg.orb.nlevels
    pyr = build_pyramid_padded(img, nlv, cfg.orb.scale_factor)
    shapes = level_shapes(480, 752, nlv, cfg.orb.scale_factor)
    vh = jnp.asarray([s[0] for s in shapes]); vw = jnp.asarray([s[1] for s in shapes])
    def per_level(lv_img, vh_i, vw_i):
        score = fast_ops.fast_score_map(lv_img, fth)
        kp = fast_ops.select_keypoints(score, n_out=256, cell=32, per_cell=4,
                                       border=19, valid_h=vh_i, valid_w=vw_i)
        blur = gaussian_blur(lv_img)
        ang = orb_ops.ic_angles_dense(blur, kp.xy)
        desc = orb_ops.brief_descriptors(blur, kp.xy, ang)
        return kp.xy, kp.valid, ang, desc
    return jax.vmap(per_level)(pyr, vh, vw)
scan_bench("point detect x2", v2(detect_points_only))
def fs_only(img):
    score = fast_ops.fast_score_map(img, fth)
    return fast_ops.select_keypoints(score, n_out=256, cell=32, per_cell=4,
                                     border=19, valid_h=480, valid_w=752)
scan_bench("fast+select x2 (L0)", v2(fs_only))
def brief_only(img):
    blur = gaussian_blur(img)
    xy = jnp.linspace(30, 400, 256)[:, None] * jnp.ones((1, 2))
    ang = orb_ops.ic_angles_dense(blur, xy)
    return orb_ops.brief_descriptors(blur, xy, ang)
scan_bench("blur+ic_dense+brief x2 (L0)", v2(brief_only))
def lbd_only(img):
    lines = lsd_ops.detect_lines(img, n_out=512)
    return lbd_ops.lbd_descriptors(img, lines.sp, lines.ep)[0]
scan_bench("lsd+lbd x2", v2(lbd_only))
