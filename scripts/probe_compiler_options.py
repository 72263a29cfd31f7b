"""Probe the tunneled compiler for which XLA/libtpu options EXIST.

Existence only (tiny jit compile per candidate); A/B measurement of any
hit happens separately through BENCH_XLA_OPT.  Control flags included.
"""
import jax, jax.numpy as jnp

def try_opt(opts):
    f = jax.jit(lambda x: (x @ x).sum())
    try:
        f.lower(jnp.ones((8, 8), jnp.float32)).compile(compiler_options=opts)
        return "OK"
    except Exception as e:
        s = str(e)
        if "No such compile option" in s:
            return "NO-SUCH"
        return "ERR: " + s.splitlines()[-1][:110]

CANDS = [
    # controls
    ("xla_tpu_scoped_vmem_limit_kib", "65536"),
    # memory-bound loop optimizer family (targets while-loop bodies)
    ("xla_tpu_enable_memory_bound_loop_optimizer", "true"),
    ("xla_tpu_memory_bound_loop_optimizer", "true"),
    # MSA / async copy family (targets copy-start/copy-done overlap)
    ("xla_tpu_async_copy_bandwidth_scaling_factor", "1.0"),
    ("xla_tpu_msa_inefficient_use_to_copy_ratio", "0.5"),
    ("xla_tpu_memory_space_assignment_max_repacks", "4"),
    ("xla_tpu_enable_copy_fusion", "true"),
    ("xla_tpu_copy_elision", "true"),
    ("xla_tpu_prefetch_mem_fraction", "0.5"),
    ("xla_tpu_enable_sliced_prefetch", "true"),
    # scheduler family
    ("xla_latency_hiding_scheduler_rerun", "2"),
    ("xla_tpu_enable_latency_hiding_scheduler", "true"),
    ("xla_tpu_scheduler_percent_shared_memory_limit", "90"),
    ("xla_tpu_enable_scheduler_memory_pressure_tracking", "true"),
    ("xla_tpu_host_transfer_overlap_limit", "4"),
    # fusion family (targets the VPU loop-fusion share)
    ("xla_tpu_enable_aggressive_instruction_fusion", "true"),
    ("xla_tpu_enable_experimental_exhaustive_output_fusion", "true"),
    ("xla_tpu_nested_dot_fusion", "true"),
    ("xla_tpu_rwb_fusion", "true"),
    ("xla_tpu_dot_dot_fusion", "true"),
    ("xla_tpu_enable_dot_strength_reduction", "true"),
    ("xla_tpu_vector_load_fusion_size", "128"),
    ("xla_tpu_use_bundle_aware_cost_model_for_fusions", "true"),
    # vmem / dma
    ("xla_tpu_enable_vmem_to_vmem_dmas", "true"),
    ("xla_tpu_allocate_scoped_vmem_at_same_offset", "true"),
    ("xla_tpu_licm_size_inflation_ratio", "2"),
    # rematerialization family
    ("xla_jf_rematerialization_percent_shared_memory_limit", "100"),
    ("xla_tpu_rematerialization_percent_shared_memory_limit", "100"),
]

for k, v in CANDS:
    print(f"{k} -> {try_opt({k: v})}", flush=True)
