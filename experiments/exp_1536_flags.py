"""XLA-flag sweep over the 1536px VisDrone train step (ROOFLINE.md §3).

The 1536px bs8+remat recipe runs ~20.5 img/s ≈ 32% MFU; the residual gap
was localised to XLA's backward-conv emitter at large-spatial/64-ch shapes
(three independent probes: space-to-batch, width-folding, Pallas — all
negative, see docs/ROOFLINE.md).  This sweep is the remaining lever class:
compiler flags.  Each config compiles the full train step (flagship
`ablation-ca-scconv-sppfcspc`, 1536px, bs8, adam, remat, bf16 — exactly
bench.py's `visdrone1536_train_bs8_remat` row) in a fresh subprocess and
times 6 state-carried steps twice, taking the best.

Flag delivery: XLA_FLAGS does NOT work on the axon stack — the client
binary only registers 5 xla_tpu_* flags and parse_flags_from_env aborts
on the rest (all 1,035 live in the server-side libtpu).  PJRT
`compiler_options` (jax.jit(..., compiler_options={...})) rides through
the remote-compile tunnel and IS parsed there (bogus names get rejected
with an HTTP 500), so that is the channel used here.

    python experiments/exp_1536_flags.py            # run sweep, print table
    python experiments/exp_1536_flags.py --child    # (internal) one config
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# flag configs: name -> compiler_options dict (all flag names verified
# present in the server-side libtpu).  Chosen for the diagnosed
# bottleneck: backward convs whose fusions are VMEM-starved / badly
# scheduled at 768px x 64ch.
CONFIGS = {
    "baseline": {},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "scavenge_vmem": {"xla_tpu_scavenge_vmem_for_fusions": "true"},
    "conv_multi_users": {"xla_tpu_input_conv_multi_users": "true"},
    "conv_downcast_fuse":
        {"xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"},
    "conv_normalizer":
        {"xla_tpu_impure_enable_convolution_normalizer": "true"},
    "rw_as_conv": {"xla_tpu_handle_reduce_window_as_convolution": "true"},
    "vmem_64m+scavenge": {"xla_tpu_scoped_vmem_limit_kib": "65536",
                          "xla_tpu_scavenge_vmem_for_fusions": "true"},
}


def child(config_name):
    options = CONFIGS[config_name]
    sys.path.insert(0, REPO)
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dmayolo_tpu.cli.common import enable_compilation_cache
    from dmayolo_tpu.graph import DetectionModel
    from dmayolo_tpu.train.loss import ComputeLoss, Targets
    from dmayolo_tpu.train.optim import Schedule, param_groups
    from dmayolo_tpu.train.step import init_train_state, make_train_step

    # per-config cache dir: compiler_options should be part of the cache
    # key, but ROOFLINE.md documents one stale-cache incident — isolate.
    enable_compilation_cache(
        "~/.cache/dmayolo_jax_flags_" + config_name.replace("+", "_"))

    hyp = {"box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
           "anchor_t": 4.0, "label_smoothing": 0.0, "fl_gamma": 0.0,
           "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 5e-4,
           "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1}
    model = DetectionModel(
        os.path.join(REPO, "dmayolo_tpu/configs/models/"
                           "ablation-ca-scconv-sppfcspc.yaml"), nc=10)
    params, stats = model.init_with_priors(jax.random.PRNGKey(0))
    loss = ComputeLoss(model.head.anchors, hyp, nc=10)
    sched = Schedule(hyp, epochs=100, steps_per_epoch=100)
    step = jax.jit(make_train_step(model, loss, sched, param_groups(model),
                                   weight_decay=5e-4, adam=True,
                                   dtype=jnp.bfloat16, remat=True),
                   compiler_options=options or None)
    rng = np.random.default_rng(0)
    bs = 8
    tgt = Targets(
        jnp.asarray(rng.integers(0, 10, (bs, 32)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.2, 0.8, (bs, 32, 4)).astype(np.float32)),
        jnp.asarray(np.ones((bs, 32), bool)),
    )
    x = jnp.asarray(rng.uniform(0, 1, (bs, 1536, 1536, 3)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    state = init_train_state(params, stats)

    t0 = time.perf_counter()
    state, met = step(state, x, tgt, key)
    jax.block_until_ready(met["loss"])
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(6):
            state, met = step(state, x, tgt, key)
        jax.block_until_ready(met["loss"])
        best = min(best, (time.perf_counter() - t0) / 6)
    print(json.dumps({"step_ms": round(best * 1000, 1),
                      "img_s": round(bs / best, 2),
                      "compile_s": round(compile_s, 1),
                      "loss": float(met["loss"])}))


def main():
    results = {}
    for name in CONFIGS:
        errpath = f"/tmp/flags_child_{name.replace('+', '_')}.err"
        try:
            with open(errpath, "w") as ef:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child", name],
                    stdout=subprocess.PIPE, stderr=ef, text=True,
                    timeout=3600)
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
        print(f"{name:22s} {results[name]['step_ms']:8.1f} ms "
              f"{results[name]['img_s']:6.2f} img/s "
              f"(compile {results[name]['compile_s']:.0f}s)", flush=True)
    base = results.get("baseline", {}).get("img_s")
    print(json.dumps({"baseline_img_s": base, "results": results}, indent=1))


if __name__ == "__main__":
    if "--child" in sys.argv:
        child(sys.argv[sys.argv.index("--child") + 1])
    else:
        main()
