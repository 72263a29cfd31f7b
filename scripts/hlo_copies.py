"""Attribute the train step's copy/copy-done time to HLO instructions.

The xplane profile shows ~9.6% of the 178 ms step in copy-done at
activation-block sizes (docs/PERF.md §6-7).  This dumps the optimized HLO of
the bench-scale step (persistent-cache hit when unchanged) and lists the
largest `copy` instructions with their shapes and op metadata so the copies
can be traced back to source constructs (layout flips, GP interpolation,
while-carry aliasing).

Usage: python scripts/hlo_copies.py [K]   (K = buildings/slot, default 6)
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from building_gan_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from building_gan_tpu.config import Configuration
from building_gan_tpu.data import grid as gridlib
from building_gan_tpu.data import preprocess, synthetic
from building_gan_tpu.models import GridVoxelGNNDiscriminator, GridVoxelGNNGenerator
from building_gan_tpu.train.state import create_train_state
from building_gan_tpu.train.step import make_train_step

K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
N = 512

samples = []
for i in range(N):
    g, l, v = synthetic.generate_building_real_scale(i)
    samples.append(preprocess.process_building(g, l, v, Configuration(), f"{i:06d}"))
max_local = max(s[0].x.shape[0] for s in samples)
cfg = Configuration(
    GRID_SHAPE=(11, 12, 12),
    GRID_SLOT_GRAPHS=K,
    GRID_LOCAL_NODES=int(np.ceil(K * max_local / 64.0)) * 64,
)
slots = gridlib.plan_packing_slots(samples, cfg)
batch = gridlib.pack_grid_multi_from_slots(samples, slots, cfg, batch_slots=len(slots))

gen = GridVoxelGNNGenerator(configuration=cfg)
disc = GridVoxelGNNDiscriminator(configuration=cfg)
state, tx_g, tx_d = create_train_state(cfg, gen, disc, batch, jax.random.key(0), 1000)
compiled = (
    jax.jit(make_train_step(cfg, gen, disc, tx_g, tx_d), donate_argnums=(0,))
    .lower(state, batch, jax.random.key(0))
    .compile()
)
hlo = compiled.as_text()

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "u8": 1, "pred": 1, "f64": 8, "u64": 8}


def shape_bytes(shape_str):
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DTYPE_BYTES.get(dt, 4)


copies = []
for line in hlo.splitlines():
    ls = line.strip()
    m = re.match(r"%?([\w.-]+) = (\S+) copy\((.+?)\)(.*)", ls)
    if not m:
        continue
    name, shape, _, rest = m.groups()
    meta = ""
    mm = re.search(r'metadata=\{(.*?)\}', rest)
    if mm:
        meta = mm.group(1)
    copies.append((shape_bytes(shape), name, shape, meta))

copies.sort(reverse=True)
total = sum(c[0] for c in copies)
print(f"{len(copies)} copy instructions, {total/1e6:.1f} MB total (static, one execution)")
for b, name, shape, meta in copies[:30]:
    src = ""
    sm = re.search(r'op_name="([^"]*)"', meta)
    if sm:
        src = sm.group(1)
    fm = re.search(r'source_file="([^"]*)".*source_line=(\d+)', meta)
    if fm:
        src += f"  [{os.path.basename(fm.group(1))}:{fm.group(2)}]"
    print(f"  {b/1e6:8.1f} MB  {shape:28s} {name:28s} {src[:110]}")
