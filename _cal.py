import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

# flip regime with a biggish compile first
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
stacks = [jnp.asarray(rng.uniform(0, 255, (N, 480, 752)).astype(np.float32)) for _ in range(4)]

def scan_bench(name, body):
    @jax.jit
    def run(xs):
        def step(c, x):
            out = body(x)
            return c + jnp.sum(out.astype(jnp.float32)), ()
        tot, _ = jax.lax.scan(step, 0.0, xs)
        return tot
    jax.block_until_ready(run(stacks[3]))
    t0 = time.perf_counter()
    for k in range(3):
        jax.block_until_ready(run(stacks[k]))
    dt = (time.perf_counter() - t0) / 3 / N * 1000
    print(f"{name:46s} {dt:8.3f} ms/img", flush=True)

scan_bench("1 elementwise pass (x*2+1)", lambda x: x * 2 + 1)
scan_bench("chain of 64 elementwise (fused?)", lambda x: sum(x * (i + 1) for i in range(64)))
def rolls64(x):
    acc = x
    for i in range(64):
        acc = acc + jnp.roll(x, (i % 5 - 2, i % 7 - 3), (0, 1))
    return acc
scan_bench("64 rolls + adds", rolls64)
def rolls16(x):
    acc = x
    for i in range(16):
        acc = acc + jnp.roll(x, (i % 5 - 2, i % 7 - 3), (0, 1))
    return acc
scan_bench("16 rolls + adds", rolls16)
def conv31(x):
    k = jnp.ones((31, 31, 1, 1), jnp.float32)
    return jax.lax.conv_general_dilated(x[None, :, :, None], k, (1, 1), "SAME",
                                        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
scan_bench("conv 31x31 (single chan)", conv31)
def sepconv31(x):
    kr = jnp.ones((1, 31, 1, 1), jnp.float32)
    kc = jnp.ones((31, 1, 1, 1), jnp.float32)
    y = jax.lax.conv_general_dilated(x[None, :, :, None], kr, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(y, kc, (1, 1), "SAME",
                                     dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[0, :, :, 0]
scan_bench("separable 31 conv (2x 1d)", sepconv31)
scan_bench("cumsum along W", lambda x: jnp.cumsum(x, axis=1))
def gath(x, n):
    flat = x.reshape(-1)
    idx = (jnp.arange(n) * 7919) % flat.shape[0]
    return flat[idx]
scan_bench("gather 32k random", lambda x: gath(x, 32768))
scan_bench("gather 256k random", lambda x: gath(x, 262144))
def scat(x):
    flat = x.reshape(-1)
    idx = (jnp.arange(32768) * 7919) % flat.shape[0]
    return jnp.zeros_like(flat).at[idx].max(flat[:32768])
scan_bench("scatter-max 32k into 360k", scat)
scan_bench("top_k 360k -> 1024 (vals)", lambda x: jax.lax.top_k(x.reshape(-1), 1024)[0])
scan_bench("bf16: 16 rolls + adds", lambda x: rolls16(x.astype(jnp.bfloat16)).astype(jnp.float32))
