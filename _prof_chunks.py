import time, numpy as np, jax, jax.numpy as jnp
from gfplslam_tpu.config import Config, CameraParams, SlamParams
from gfplslam_tpu.io import synthetic
from gfplslam_tpu.models.slam import SLAMSystem
cam = CameraParams()
cfg = Config(camera=cam, slam=SlamParams(lc_kf_dist=12, lc_kf_max_dist=6))
n = 121; chunk = 24
world = synthetic.make_world(n_frames=n, n_points=900, n_lines=90, seed=11,
                             motion="circuit", cam=cam, textured=True)
fr = [synthetic.render_frame(world, i, noise=1.0) for i in range(n)]
u8 = lambda x: np.clip(np.round(x), 0, 255).astype(np.uint8)
il = u8(np.stack([f[0] for f in fr])); ir = u8(np.stack([f[1] for f in fr]))
ts = np.asarray(world.timestamps)

# warm
s = SLAMSystem(cfg); s.run_sequence(il, ir, ts, chunk=chunk); s.finish()

# instrumented run
import gfplslam_tpu.models.slam as slam_mod
s = SLAMSystem(cfg)
t_all = time.perf_counter()
bounds = [0, chunk + 1]
while bounds[-1] < n: bounds.append(min(bounds[-1] + chunk, n))
pend = None
nxt = (jax.device_put(il[0:bounds[1]]), jax.device_put(ir[0:bounds[1]]))
for k in range(len(bounds) - 1):
    a, b = bounds[k], bounds[k+1]
    cur = nxt
    t0 = time.perf_counter()
    if k + 2 < len(bounds):
        nxt = (jax.device_put(il[bounds[k+1]:bounds[k+2]]),
               jax.device_put(ir[bounds[k+1]:bounds[k+2]]))
    t_stage = time.perf_counter() - t0
    t0 = time.perf_counter()
    scanned = s._scan_chunk(cur[0], cur[1], ts[a:b])
    t_scan_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    if pend is not None:
        packed = np.asarray(pend[0])
        t_read = time.perf_counter() - t0
        t0 = time.perf_counter()
        s._process_scanned((jnp.asarray(packed),) + tuple(pend[1:]))
        t_map = time.perf_counter() - t0
    else:
        t_read = t_map = 0.0
    pend = scanned
    print(f"chunk {k}: stage={t_stage*1e3:.0f}ms scan_disp={t_scan_disp*1e3:.0f}ms "
          f"packed_read={t_read*1e3:.0f}ms map+lc={t_map*1e3:.0f}ms")
t0 = time.perf_counter()
packed = np.asarray(pend[0])
print(f"last packed_read={1e3*(time.perf_counter()-t0):.0f}ms")
t0 = time.perf_counter()
s._process_scanned((jnp.asarray(packed),) + tuple(pend[1:]))
print(f"last map={1e3*(time.perf_counter()-t0):.0f}ms")
t0 = time.perf_counter()
s.finish()
print(f"finish={1e3*(time.perf_counter()-t0):.0f}ms total={time.perf_counter()-t_all:.2f}s closures={s.n_loop_closures}")
