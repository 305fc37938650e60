"""bf16-vs-f32 eval numerics guard (PARITY.md link 6).

cli/val.py defaults eval compute to bfloat16 where the reference runs
fp16/fp32.  Candidate selection at conf 0.001 over a dense ranking is
precision-sensitive, so this pins the measured delta: a briefly-trained
tiny model evaluated under the full protocol in both dtypes must agree on
mAP within 1 pt.  (The deployed-size measurement on the real chip lives
in docs/PARITY.md.)
"""
import numpy as np
import pytest

import jax.numpy as jnp

from dmayolo_tpu.data.synthetic import generate
from dmayolo_tpu.eval.validator import run_validation
from dmayolo_tpu.train.trainer import Trainer

from test_e2e_train import HYP, TINY_CFG


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("bf16shapes")
    data = generate(root, n_train=48, n_val=12, img_size=256, seed=2)
    trainer = Trainer(
        TINY_CFG, str(data), HYP, epochs=22, batch_size=8, img_size=256,
        out_dir=str(tmp_path_factory.mktemp("bf16exp")), dtype=jnp.float32,
        workers=2, max_targets=32, val_interval=100, warmup_min_iters=60,
        seed=0, accumulate=1,
    )
    trainer.train(log_every=100)
    return trainer, str(data)


def test_bf16_eval_within_1pt_of_f32(trained):
    trainer, data = trained
    from dmayolo_tpu.data.datasets import check_dataset

    kw = dict(
        data_path=check_dataset(data)["val"], img_size=256, batch_size=8, nc=3,
        conf_thres=0.001, iou_thres=0.6, max_det=300, max_targets=32,
    )
    r32 = run_validation(trainer.model, trainer.state.ema_params,
                         trainer.state.ema_stats, dtype=jnp.float32, **kw)
    r16 = run_validation(trainer.model, trainer.state.ema_params,
                         trainer.state.ema_stats, dtype=jnp.bfloat16, **kw)
    assert r32.map50 > 0.10, "model too weak — delta check vacuous"
    assert abs(r32.map50 - r16.map50) < 0.01, (r32.map50, r16.map50)
    assert abs(r32.map - r16.map) < 0.01, (r32.map, r16.map)
