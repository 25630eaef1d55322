"""VPU/HBM roofline for the BDPT integrator's elementwise math (VERDICT
r04 #4): is the CBspheres step's 61%-of-time fusion mix at a hardware
bound, or is there headroom a combo-batched restructuring could claim?

Method:
  1. compile the production CBspheres bdpt step (same operand signature
     as bench.py) and pull XLA's cost_analysis: `flops` and
     `bytes accessed` EXCLUDE custom calls (the Pallas intersect kernels
     report no flops), so both numbers are dominated by exactly the
     vectorized BDPT arithmetic in question — RNG, subpath recurrences,
     connections, MIS walks, shading;
  2. time the executed step, take the fusion-mix share of the step from
     the committed trace breakdown (artifacts/trace_cbspheres: 61%
     fusions at r04), and convert to achieved GFLOP/s and GB/s;
  3. compare against the chip peaks (TPU v5e: ~3.9 TFLOP/s fp32 VPU =
     940 MHz x 8x128 lanes x 4 ALUs; 819 GB/s HBM).

If achieved-GB/s over the fusion window is near HBM peak, the mix is
bandwidth-bound: combo-batching the 42 (s,t) strategies into [C,S]
arrays moves the same bytes and cannot win.  If bytes AND flops are both
far from peak, the bottleneck is op issue/scheduling and batching has
room.

    python tools/profiling/elementwise_roofline.py [fusion_share]
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

V5E_HBM_GBPS = 819.0
V5E_VPU_GFLOPS = 940e6 * 8 * 128 * 4 / 1e9   # ~3.85 TFLOP/s fp32


def main():
    fusion_share = float(sys.argv[1]) if len(sys.argv) > 1 else 0.61

    import jax.numpy as jnp
    from bidirectional_pathtracing_tpu.config import RenderConfig
    from bidirectional_pathtracing_tpu.scene.build import load_scene
    from bidirectional_pathtracing_tpu.utils.render import (
        _bdpt_step_chunk, _trace_cfg)

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass
    w, h, chunk = 480, 360, 8
    scene, aux = load_scene("/root/reference/dae/sky/CBspheres.dae", w, h)
    cfg = RenderConfig(spp=8, max_ray_depth=5, width=w, height=h,
                       integrator="bdpt")
    tcfg = _trace_cfg(cfg)
    inv = jnp.float32(1.0 / cfg.spp)
    key = jax.random.key(0)

    fn = jax.jit(lambda s, k, b, i: _bdpt_step_chunk(
        s, k, b, tcfg, w, h, chunk, i))
    lowered = fn.lower(scene, key, jnp.int32(0), inv)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    byt = float(ca.get("bytes accessed", float("nan")))

    # execute (warm) and time
    out = compiled(scene, key, jnp.int32(0), inv)
    np.asarray(out[0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = compiled(scene, key, jnp.int32(0), inv)
    np.asarray(out[0])
    step_s = (time.perf_counter() - t0) / reps

    fus_s = step_s * fusion_share
    # attribute the trace's standalone copy/slice ops (21% bucket at r04):
    # find the largest copy/slice/concatenate shapes in the optimized HLO
    big = []
    try:
        import re
        hlo = compiled.as_text()
        for m in re.finditer(
                r"(copy|slice|concatenate)[.\d]*\s*=\s*"
                r"(s32|f32|pred|u32)\[([\d,]*)\]", hlo):
            dims = [int(x) for x in m.group(3).split(",") if x]
            n = 1
            for x in dims:
                n *= x
            big.append((n, m.group(1), dims))
        big.sort(reverse=True)
        big = [{"op": k, "shape": d,
                "mb": round(n * 4 / 1e6, 1)} for n, k, d in big[:8]]
    except Exception as e:  # HLO text unavailable on some backends
        big = [str(e)]

    res = {
        "scene": "CBspheres", "chunk_spp": chunk,
        "step_s": round(step_s, 4),
        "fusion_share_assumed": fusion_share,
        "fusion_window_s": round(fus_s, 4),
        "xla_flops": flops,
        "xla_bytes_accessed": byt,
        "achieved_gflops_in_window": round(flops / fus_s / 1e9, 1),
        "achieved_gbps_in_window": round(byt / fus_s / 1e9, 1),
        "vpu_peak_gflops": round(V5E_VPU_GFLOPS, 0),
        "hbm_peak_gbps": V5E_HBM_GBPS,
        "pct_vpu_peak": round(100 * flops / fus_s / 1e9 / V5E_VPU_GFLOPS, 1),
        "pct_hbm_peak": round(100 * byt / fus_s / 1e9 / V5E_HBM_GBPS, 1),
        "largest_copy_slice_concat": big,
    }
    print(json.dumps(res, indent=1))
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/ELEMENTWISE_ROOFLINE.json", "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
