import time
import numpy as np
import jax
import jax.numpy as jnp
from gfplslam_tpu.config import Config, CameraParams
from gfplslam_tpu.models import frame as frame_mod, pose_opt, linecut

cam = CameraParams()
cfg = Config(camera=cam)
rng = np.random.default_rng(0)
i0 = jnp.asarray(rng.uniform(0, 255, (480, 752)).astype(np.float32))
fe = jax.jit(lambda a, b: frame_mod.process_stereo_pair(a, b, cfg, jnp.asarray(20.0)))
fe.lower(i0, i0).compile()
print("flipped", flush=True)

N = 8
def mkpts(seed):
    r = np.random.default_rng(seed)
    p3d = np.stack([r.uniform(-3, 3, (N, 1024)), r.uniform(-2, 2, (N, 1024)),
                    r.uniform(2, 9, (N, 1024))], -1).astype(np.float32)
    obs = r.uniform(0, 700, (N, 1024, 2)).astype(np.float32)
    return (jnp.asarray(p3d), jnp.asarray(obs))
def mklns(seed):
    r = np.random.default_rng(seed + 1)
    sp = np.stack([r.uniform(-3, 3, (N, 512)), r.uniform(-2, 2, (N, 512)),
                   r.uniform(2, 9, (N, 512))], -1).astype(np.float32)
    ep = sp + r.normal(0, 0.5, (N, 512, 3)).astype(np.float32)
    ep[..., 2] = np.abs(ep[..., 2]) + 2
    le = r.normal(size=(N, 512, 3)).astype(np.float32)
    le /= np.linalg.norm(le[..., :2], axis=-1, keepdims=True)
    cov = np.tile(np.eye(3, dtype=np.float32)[None, None] * 0.01, (N, 512, 1, 1))
    return (jnp.asarray(sp), jnp.asarray(ep), jnp.asarray(le), jnp.asarray(cov))

data = [(mkpts(s), mklns(s)) for s in range(4)]

def scan_bench(name, body):
    @jax.jit
    def run(pts_in, lns_in):
        def step(c, x):
            out = body(x[0], x[1])
            return c + jnp.sum(out), ()
        tot, _ = jax.lax.scan(step, 0.0, (pts_in, lns_in))
        return tot
    jax.block_until_ready(run(*data[3]))
    t0 = time.perf_counter()
    for k in range(3):
        jax.block_until_ready(run(*data[k]))
    dt = (time.perf_counter() - t0) / 3 / N * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)

val_p = jnp.ones(1024, bool)
val_l = jnp.ones(512, bool)
one_p = jnp.ones(1024)
one_l = jnp.ones(512)

def empty(p, l):
    return jnp.sum(p[0][:, 0]) + jnp.sum(l[0][:, 0])
scan_bench("empty (scan floor)", empty)

def pose_only(p, l):
    pts = pose_opt.PointMatches(p3d=p[0], obs=p[1], sigma2=one_p, valid=val_p)
    lns = pose_opt.LineMatches(sp3d=l[0], ep3d=l[1], le_obs=l[2],
                               sigma2=one_l, valid=val_l)
    res = pose_opt.optimize_pose(cam, jnp.eye(4), pts, lns, cfg.optimizer, 0.05)
    return res.dt
scan_bench("optimize_pose (5+10 GN)", pose_only)

def cut_only(p, l):
    pts = pose_opt.PointMatches(p3d=p[0], obs=p[1], sigma2=one_p, valid=val_p)
    lns = pose_opt.LineMatches(sp3d=l[0], ep3d=l[1], le_obs=l[2],
                               sigma2=one_l, valid=val_l)
    cut = linecut.cut_lines(cam, jnp.eye(4), lns, l[3], l[3], pts, use_logdet=True)
    return cut.r0
scan_bench("cut_lines (10 steps)", cut_only)

def gn_k(p, l, k):
    pts = pose_opt.PointMatches(p3d=p[0], obs=p[1], sigma2=one_p, valid=val_p)
    lns = pose_opt.LineMatches(sp3d=l[0], ep3d=l[1], le_obs=l[2],
                               sigma2=one_l, valid=val_l)
    dt, cov, err = pose_opt.gauss_newton(cam, jnp.eye(4), pts, lns,
                                         cfg.optimizer, k)
    return dt
scan_bench("gauss_newton 1 iter", lambda p, l: gn_k(p, l, 1))
scan_bench("gauss_newton 5 iter", lambda p, l: gn_k(p, l, 5))
