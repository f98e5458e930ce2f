"""A/B XLA compiler options on the int8 embed (slope method).

Measured 2026-08-17 (quiet host, TPU v5e, 256x224px bag, int8 PTQ embed):

    default                 :   5.529 ms/embed
    scoped_vmem 32MiB       :   5.650 ms/embed
    scoped_vmem 64MiB       :   5.844 ms/embed
    latency-hiding sched    :   5.774 ms/embed

Negative result: XLA's default scoped-VMEM limit and scheduler are already
optimal for this program; every option measured slightly worse (within to
just past the +-5% ambient drift band, and none better).  Kept as a
harness for re-testing on other TPU generations / runtimes.
"""
import functools, time, sys
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import numpy as np
from montecarlo_gated_mil_tpu.models import MultiHeadGatedAttentionMIL
from montecarlo_gated_mil_tpu.runners import init_params
from montecarlo_gated_mil_tpu.ops.quantized import (
    quantize_backbone_static, quantized_embed_static,
)

model = MultiHeadGatedAttentionMIL(backbone="r18", dtype=jnp.bfloat16)
with jax.default_device(jax.devices("cpu")[0]):
    params = init_params(model, jax.random.key(0))
params = jax.tree.map(np.asarray, params)
qp = quantize_backbone_static(params["features"], "r18")
N = 256
patches = jax.device_put(
    np.random.RandomState(0).randn(N, 224, 224, 3).astype(np.float32)
).astype(jnp.bfloat16)
mask = jnp.ones((N,), bool)

def fn(p):
    return quantized_embed_static(qp, p, mask, backbone="r18")

def slope(opts, ks=(2, 6, 12), reps=4):
    def chain(k, a):
        def body(c, i):
            out = fn(a + (c * 1e-6).astype(a.dtype))
            return jnp.sum(out.astype(jnp.float32)) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.asarray(0.0, jnp.float32), jnp.arange(k))
        return c
    totals = {}
    for k in ks:
        lowered = jax.jit(functools.partial(chain, k)).lower(patches)
        g = lowered.compile(compiler_options=opts or None)
        float(np.asarray(g(patches)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(g(patches)))
            best = min(best, time.perf_counter() - t0)
        totals[k] = best
    ks_ = sorted(totals)
    slopes = sorted(
        (totals[b] - totals[a]) / (b - a)
        for a, b in zip(ks_, ks_[1:])
    )
    return slopes[len(slopes) // 2]

CONFIGS = [
    ("default", {}),
    ("scoped_vmem 32MiB", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem 64MiB", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("latency-hiding sched", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
]
for name, opts in CONFIGS:
    try:
        t = slope(opts)
        print(f"{name:24s}: {t*1e3:7.3f} ms/embed", flush=True)
    except Exception as e:
        print(f"{name:24s}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
