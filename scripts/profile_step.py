"""Profile one train step on the TPU and dump an xplane trace.

Run from the repo root; convert with xprof:
    python scripts/profile_step.py
    python -c "from xprof.convert import raw_to_tool_data as r; import glob; \
        d,_=r.xspace_to_tool_data(glob.glob('/tmp/jaxprof/plugins/profile/*/*.xplane.pb'),'op_profile',{}); \
        open('/tmp/op_profile.json','w').write(d)"
"""
import glob, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from building_gan_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from building_gan_tpu.config import Configuration
from building_gan_tpu.data import grid as gridlib, preprocess, synthetic
from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
from building_gan_tpu.train.state import create_train_state
from building_gan_tpu.train.step import make_train_step

N = int(os.environ.get("PROF_N", "128"))
K = int(os.environ.get("PROF_K", "1"))  # buildings per slot (bench uses 6)
_prng = os.environ.get("PROF_PRNG")  # e.g. rbg_full to profile the headline
if _prng:
    from building_gan_tpu.utils.prng import apply_prng_impl
    apply_prng_impl(_prng)
samples = []
for i in range(N):
    g, l, v = synthetic.generate_building_real_scale(i)
    samples.append(preprocess.process_building(g, l, v, Configuration(), f"{i:06d}"))
max_local = max(s[0].x.shape[0] for s in samples)
cfg = Configuration(
    GRID_SHAPE=(11,12,12), GRID_SLOT_GRAPHS=K,
    GRID_LOCAL_NODES=64 if K == 1 else int(np.ceil(K * max_local / 64.0)) * 64,
    ENCODER_DROPOUT_RATE=float(os.environ.get("PROF_DROPOUT", "0.2")),
)
if K == 1:
    batch = gridlib.pack_grid(samples, cfg.replace(GRID_BATCH=N))
else:  # bench-identical multipack workload
    slots = gridlib.plan_packing_slots(samples, cfg)
    batch = gridlib.pack_grid_multi_from_slots(samples, slots, cfg, batch_slots=len(slots))
    print(f"multipack: {N} buildings -> {len(slots)} slots, "
          f"fill {100.0*np.asarray(batch.mask).sum()/np.prod(batch.mask.shape):.1f}%", flush=True)
batch = jax.device_put(batch)

gen = GridVoxelGNNGenerator(configuration=cfg)
disc = GridVoxelGNNDiscriminator(configuration=cfg)
state, tx_g, tx_d = create_train_state(cfg, gen, disc, batch, jax.random.key(0), 1000)
step = jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d), donate_argnums=(0,))
state, m = step(state, batch, jax.random.key(0)); _=float(m["g_loss"])
t0=time.perf_counter()
for s in range(4):
    state, m = step(state, batch, jax.random.fold_in(jax.random.key(1), s))
_=float(m["g_loss"])
print(f"step: {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)

with jax.profiler.trace(os.environ.get("PROF_DIR", "/tmp/jaxprof")):
    for s in range(2):
        state, m = step(state, batch, jax.random.fold_in(jax.random.key(2), s))
    _=float(m["g_loss"])
print("trace files:", glob.glob(os.environ.get("PROF_DIR", "/tmp/jaxprof") + "/**/*.xplane.pb", recursive=True), flush=True)
