"""dmayolo_tpu — a TPU-native small-object-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DMA-YOLO
(a YOLOv5-family detector specialised for drone/aerial small-object
detection).  The compute path is pure JAX (NHWC, bf16-friendly, jit/pjit
over device meshes); nothing here is a port of the reference's PyTorch
code — behaviour parity is established against `/root/reference` via
golden tests, while the implementation is TPU-first.

Layout:
    core/      pure jit-able functions: box geometry, IoU family, NMS
    nn/        module zoo (Flax linen, NHWC)
    graph/     YAML model-config parser + model assembly (registry, no eval)
    data/      input pipeline (label cache, mosaic, letterbox, device aug)
    train/     losses, assigners, optimizer policy, EMA, train step
    eval/      mAP / PR metrics, validator, TTA
    parallel/  mesh + sharding helpers (dp + spatial sharding)
    cli/       train / val / detect / export entry points
"""

__version__ = "0.1.0"
