import time
import jax, jax.numpy as jnp

shape = (128, 1584, 128)  # one G-forward z at 128 slots: 26M elements
n = 26 * 1000 * 1000

def t(name, f):
    k = jax.random.key(0)
    out = f(k); jax.block_until_ready(out)
    t0=time.perf_counter()
    for i in range(8):
        out = f(jax.random.fold_in(k, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/8
    print(f"{name}: {dt*1e3:.2f} ms  ({n/dt/1e9:.1f} Gelem/s)", flush=True)

t("normal f32", lambda k: jax.random.normal(k, shape, dtype=jnp.float32))
t("normal bf16", lambda k: jax.random.normal(k, shape, dtype=jnp.bfloat16))
t("uniform f32", lambda k: jax.random.uniform(k, shape))
t("bits u32", lambda k: jax.random.bits(k, shape, dtype=jnp.uint32))
t("bits u8", lambda k: jax.random.bits(k, shape, dtype=jnp.uint8))
t("gumbel f32", lambda k: jax.random.gumbel(k, (128, 1584, 7)))
