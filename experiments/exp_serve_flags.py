"""Compiler-flag sweep over the flagship SERVING program (ROOFLINE.md §2).

The fused serve path (normalise + forward + decode + NMS, bf16, 640px,
bs128) runs 818 img/s = 74.6% MXU vs an 1,097 img/s compute ceiling;
ROOFLINE.md §2 attributes the 1.2x-of-bound residue to emitter/fusion
overhead at the 64-128-ch stages.  This sweeps server-side libtpu flags
over exactly bench.py's primary metric, delivered via PJRT
`compiler_options` (XLA_FLAGS cannot reach the axon remote compiler —
see exp_1536_flags.py docstring).

    python experiments/exp_serve_flags.py             # sweep, print table
    python experiments/exp_serve_flags.py --child X   # (internal)

Timing = bench.py's scan timer (ITERS serve passes inside one jitted
lax.scan with a data-dependent carry, calibrated empty-scan overhead
subtracted) — the only method that holds over the axon tunnel.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> compiler_options (values are strings; parsed by the server-side
# libtpu — unknown names fail the remote compile, which the table records)
CONFIGS = {
    "baseline": {},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "scavenge_vmem": {"xla_tpu_scavenge_vmem_for_fusions": "true"},
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "exp_cost_model": {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    "aggr_loop_fusion": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "nested_loop_fusion": {"xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    "x8_into_conv": {"xla_tpu_fuse_non_trivial_x8_producers_into_conv_like": "true"},
    "conv_input_fusion": {"xla_tpu_input_conv_multi_users": "true",
                          "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"},
    "mosaic_emitters": {"xla_tpu_enable_mosaic_emitters": "true"},
    "autotune_fusions": {"xla_tpu_autotune_fusions": "true"},
    "rw_as_conv": {"xla_tpu_handle_reduce_window_as_convolution": "true"},
}


def child(config_name):
    options = CONFIGS[config_name]
    sys.path.insert(0, REPO)
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.core.nms import nms_parts
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.nn.fuse import fuse_params

    enable_compilation_cache(
        "~/.cache/dmayolo_serve_flags_" + config_name.replace("+", "_"))

    model = DetectionModel(
        os.path.join(REPO, "dmayolo_tpu/configs/models/"
                           "ablation-ca-scconv-sppfcspc.yaml"), nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    fp, fs = fuse_params(model, params, stats)

    def serve(p, s, x):
        xf = x.astype(jnp.bfloat16) / 255.0
        raw = model.apply(p, s, xf, fused=True, dtype=jnp.bfloat16)
        boxes, scores, cls = model.decode_parts(raw)
        return nms_parts(boxes, scores, cls, conf_thres=0.25,
                         iou_thres=0.45, max_det=300, max_nms=512,
                         backend="matrix")

    ITERS = 20

    @jax.jit
    def empty(xx):
        def body(c, _):
            return c * 0.5, ()
        c, _ = jax.lax.scan(body, jnp.sum(xx), None, length=ITERS)
        return c

    float(empty(jnp.zeros((8, 8), jnp.float32)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(empty(jnp.zeros((8, 8), jnp.float32)))
        ts.append((time.perf_counter() - t0) * 1000)
    overhead_ms = sorted(ts)[len(ts) // 2]

    def run(p, s, x):
        def body(carry, _):
            dets, valid = serve(p, s, x + carry)
            return valid[0, 0].astype(jnp.uint8), ()
        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint8), None,
                            length=ITERS)
        return c

    run = jax.jit(run, compiler_options=options or None)
    fp = jax.device_put(fp)
    fs = jax.device_put(fs)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (128, 640, 640, 3), dtype=np.uint8))

    t0 = time.perf_counter()
    float(run(fp, fs, x))  # compile + warm
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(fp, fs, x))
        best = min(best, ((time.perf_counter() - t0) - overhead_ms / 1000)
                   / ITERS)
    print(json.dumps({"batch_ms": round(best * 1000, 2),
                      "img_s": round(128 / best, 1),
                      "compile_s": round(compile_s, 1)}))


def main():
    results = {}
    for name in CONFIGS:
        errpath = f"/tmp/serve_flags_{name}.err"
        try:
            with open(errpath, "w") as ef:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child", name],
                    stdout=subprocess.PIPE, stderr=ef, text=True, timeout=3600)
        except subprocess.TimeoutExpired:
            # one hung compile must not lose the whole sweep's results table
            results[name] = {"error": "timeout (3600s)"}
            print(f"{name:22s} TIMEOUT", flush=True)
            continue
        line = next((ln for ln in r.stdout.splitlines()
                     if ln.startswith("{")), None)
        if r.returncode != 0 or line is None:
            with open(errpath) as ef:
                results[name] = {"error": ef.read()[-400:]}
            print(f"{name:22s} FAILED", flush=True)
            continue
        results[name] = json.loads(line)
        print(f"{name:22s} {results[name]['batch_ms']:8.2f} ms/batch "
              f"{results[name]['img_s']:7.1f} img/s "
              f"(compile {results[name]['compile_s']:.0f}s)", flush=True)
    base = results.get("baseline", {}).get("img_s")
    print(json.dumps({"baseline_img_s": base, "results": results}, indent=1))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
