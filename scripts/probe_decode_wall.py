"""Batch-1 decode wall attribution (VERDICT r2 item 7).

Decomposes the batch-1 megakernel generate wall time into:
  on-device kernel time (profiler)  +  residual (host + tunnel RTT)
and measures the irreducible per-dispatch RTT floor with a trivial 1-op
program whose arg upload + execute + fetch mirrors the decode call shape.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from composer_tpu import bench
from composer_tpu.models import ModelType
from composer_tpu.train.generate import generate_ids

# 1) trivial-dispatch RTT floor: int32 in (like the prompt), int32 out
#    (like the ids), one jitted call per iteration.
@jax.jit
def trivial(x):
    return x + 1

probe_in = np.arange(1024, dtype=np.int32)
np.asarray(trivial(probe_in))  # compile
rtts = []
for _ in range(15):
    t0 = time.perf_counter()
    np.asarray(trivial(probe_in))
    rtts.append(time.perf_counter() - t0)
rtts = np.sort(np.asarray(rtts))
print(f"trivial dispatch wall: min {rtts[0]*1e3:.1f} ms  "
      f"p50 {rtts[len(rtts)//2]*1e3:.1f} ms  mean {rtts.mean()*1e3:.1f} ms")

# 2) the real batch-1 decode: wall + on-device time
dtype = jnp.bfloat16
model = bench._default_transformer(True, dtype)
params = model.init_params(jax.random.PRNGKey(0), 1, 8)
prompt = np.random.default_rng(0).integers(0, 390, (1, 10)).astype(np.int32)

def call():
    return np.asarray(generate_ids(
        model, ModelType.TRANSFORMER, params, prompt,
        length=1014, temperature=1.0, seed=0))

call()  # compile
walls = []
for _ in range(8):
    t0 = time.perf_counter()
    call()
    walls.append(time.perf_counter() - t0)
walls = np.sort(np.asarray(walls))
wall = walls[0]
device = bench._device_seconds_per_call(call, calls=3)
residual = wall - (device or 0.0)
print(f"decode wall (min of 8): {wall*1e3:.1f} ms  -> {1014/wall:,.0f} ev/s")
print(f"on-device: {device*1e3:.1f} ms  residual: {residual*1e3:.1f} ms")
print(f"RTT floor / residual: {rtts[0]/residual*100:.0f}% (min) "
      f"{rtts[len(rtts)//2]/residual*100:.0f}% (p50)")
