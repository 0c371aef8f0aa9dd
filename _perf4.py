import time
import numpy as np
import jax
import jax.numpy as jnp
from gfplslam_tpu.config import Config, CameraParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models import frame as frame_mod, tracker as trk

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

st0 = trk.initial_state(cfg)

def scan_bench(name, body):
    @jax.jit
    def run(ls, rs):
        f0 = frame_mod.process_stereo_pair(ls[0], rs[0], cfg, fth)
        def step(carry, ab):
            prev_f, st = carry
            out, new_f, new_st = body(prev_f, st, ab[0], ab[1])
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
            return (new_f, new_st), s
        (_, _), ss = jax.lax.scan(step, (f0, st0), (ls[1:], rs[1:]))
        return jnp.sum(ss)
    jax.block_until_ready(run(*stacks[3]))
    t0 = time.perf_counter()
    for k in range(3):
        jax.block_until_ready(run(*stacks[k]))
    dt = (time.perf_counter() - t0) / 3 / (N - 1) * 1000
    print(f"{name:42s} {dt:8.2f} ms/frame", flush=True)

def full(prev_f, st, a, b):
    cur = frame_mod.process_stereo_pair(a, b, cfg, st.fast_th)
    out = trk.track_step(cfg, st, prev_f, cur, jnp.asarray(0.05))
    return (out.pose.dt,), cur, out.state
scan_bench("FULL track step (fe+match+cut+pose)", full)

def fe_only(prev_f, st, a, b):
    cur = frame_mod.process_stereo_pair(a, b, cfg, st.fast_th)
    return (cur.points.p3d,), cur, st
scan_bench("fe only", fe_only)

def fe_match(prev_f, st, a, b):
    cur = frame_mod.process_stereo_pair(a, b, cfg, st.fast_th)
    mm = trk.cross_frame_matching(cfg, prev_f, cur, jnp.eye(4))
    return (mm.points.obs,), cur, st
scan_bench("fe + cross-match", fe_match)

from gfplslam_tpu.models import linecut, pose_opt
from gfplslam_tpu.models.frame import estimate_line_uncertainty

def fe_match_cut(prev_f, st, a, b):
    cur = frame_mod.process_stereo_pair(a, b, cfg, st.fast_th)
    mm = trk.cross_frame_matching(cfg, prev_f, cur, jnp.eye(4))
    pl = estimate_line_uncertainty(cfg.camera, cfg, prev_f.lines)
    cut = linecut.cut_lines(cfg.camera, jnp.eye(4), mm.lines, pl.cov_sp3d,
                            pl.cov_ep3d, mm.points, use_logdet=True)
    return (cut.r0,), cur, st
scan_bench("fe + cross + linecut", fe_match_cut)

def fe_match_pose(prev_f, st, a, b):
    cur = frame_mod.process_stereo_pair(a, b, cfg, st.fast_th)
    mm = trk.cross_frame_matching(cfg, prev_f, cur, jnp.eye(4))
    res = pose_opt.optimize_pose(cfg.camera, jnp.eye(4), mm.points, mm.lines,
                                 cfg.optimizer, 0.05)
    return (res.dt,), cur, st
scan_bench("fe + cross + pose_opt (no cut)", fe_match_pose)
