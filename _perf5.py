import time
import numpy as np
import jax
import jax.numpy as jnp
from gfplslam_tpu.config import Config, CameraParams
from gfplslam_tpu.models import frame as frame_mod
cam = CameraParams()
cfg = Config(camera=cam)
rng = np.random.default_rng(0)
i0 = jnp.asarray(rng.uniform(0, 255, (480, 752)).astype(np.float32))
fe = jax.jit(lambda a, b: frame_mod.process_stereo_pair(a, b, cfg, jnp.asarray(20.0)))
fe.lower(i0, i0).compile()
print("flipped", flush=True)

N = 8
xs = [jnp.asarray(rng.normal(size=(N, 1024, 6)).astype(np.float32)) for _ in range(4)]

def scan_bench(name, body):
    @jax.jit
    def run(x):
        def step(c, xi):
            out = body(xi)
            return c + jnp.sum(out), ()
        tot, _ = jax.lax.scan(step, 0.0, x)
        return tot
    jax.block_until_ready(run(xs[3]))
    t0 = time.perf_counter()
    for k in range(3):
        jax.block_until_ready(run(xs[k]))
    dt = (time.perf_counter() - t0) / 3 / N * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)

def solve15(j):
    h = j.T @ j + 1e-3 * jnp.eye(6)
    g = jnp.sum(j, 0)
    acc = 0.0
    for _ in range(15):
        dx = jnp.linalg.solve(h, g)
        acc = acc + dx
        g = g + dx
    return acc
scan_bench("15x jnp.linalg.solve 6x6", solve15)

def chol15(j):
    h = j.T @ j + 1e-3 * jnp.eye(6)
    g = jnp.sum(j, 0)
    acc = 0.0
    for _ in range(15):
        l = jnp.linalg.cholesky(h)
        dx = jax.scipy.linalg.cho_solve((l, True), g)
        acc = acc + dx
        g = g + dx
    return acc
scan_bench("15x cholesky+cho_solve 6x6", chol15)

def einsums15(j):
    acc = jnp.zeros((6, 6))
    for _ in range(15):
        acc = acc + jnp.einsum("ni,nj->ij", j, j)
        j = j * 1.0001
    return acc
scan_bench("15x einsum [1024,6]^T[1024,6]", einsums15)

def expmaps(j):
    from gfplslam_tpu.utils import se3
    acc = jnp.eye(4)
    for _ in range(15):
        acc = acc @ se3.expmap_se3(j[0])
    return acc
scan_bench("15x expmap+matmul4", expmaps)

def sorts(j):
    acc = 0.0
    for _ in range(4):
        acc = acc + jnp.sort(j[:, 0])[512]
        j = j * 1.0001
    return acc
scan_bench("4x sort(1024)", sorts)

def inv15(j):
    h = j.T @ j + 1e-3 * jnp.eye(6)
    acc = jnp.zeros((6, 6))
    for _ in range(15):
        acc = acc + jnp.linalg.inv(h + acc * 1e-9)
    return acc
scan_bench("15x inv 6x6", inv15)
