"""Golden parity: activation zoo + loss-variant functions vs the reference.

Reference surfaces: utils/activations.py:12-101 (SiLU/Hardswish/Mish,
FReLU, AconC, MetaAconC) and utils/loss.py:13-132 (smooth_BCE, BCEBlur,
FocalLoss, QFocalLoss) + utils/tal.py:73-85 (varifocal). None of these
appears in a buildable config or the default loss stack under test
elsewhere (FocalLoss only activates via hyp fl_gamma>0), so this file
pins them directly against the torch implementations.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.nn import activations as A
from dmayolo_tpu.nn.module import ApplyCtx, Vars
from dmayolo_tpu.nn.primitives import hardswish, mish, silu
from dmayolo_tpu.train import loss as L

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from utils import activations as ra  # noqa: E402
from utils import loss as rl  # noqa: E402
from utils.tal import VarifocalLoss as RefVarifocal  # noqa: E402

RNG = np.random.default_rng(0)


def _x(shape=(2, 8, 6, 6)):
    return RNG.uniform(-3, 3, shape).astype(np.float32)


# ----------------------------------------------------------- activations

@pytest.mark.parametrize("ref_cls,fn", [
    (ra.SiLU, silu), (ra.Hardswish, hardswish), (ra.Mish, mish),
])
def test_pure_activations(ref_cls, fn):
    x = _x()
    with torch.no_grad():
        want = ref_cls()(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))), want, atol=1e-6)


def test_frelu():
    torch.manual_seed(0)
    ref = ra.FReLU(8).eval()
    # in-model the reference forces every BN to eps=1e-3
    # (torch_utils.py:167-168) — match ours (BatchNorm2d default 1e-3)
    ref.bn.eps = 1e-3
    ours = A.FReLU(8)
    params, stats = ours.init(jax.random.PRNGKey(0))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params[("conv", "kernel")] = jnp.asarray(sd["conv.weight"].transpose(2, 3, 1, 0))
    params[("bn", "scale")] = jnp.asarray(sd["bn.weight"])
    params[("bn", "bias")] = jnp.asarray(sd["bn.bias"])
    stats[("bn", "mean")] = jnp.asarray(sd["bn.running_mean"])
    stats[("bn", "var")] = jnp.asarray(sd["bn.running_var"])
    x = _x((2, 8, 6, 6))
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    v = Vars(params, stats, ApplyCtx(train=False))
    got = np.asarray(ours(v, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_aconc():
    torch.manual_seed(1)
    ref = ra.AconC(8).eval()
    ours = A.AconC(8)
    params, _ = ours.init(jax.random.PRNGKey(0))
    for name in ("p1", "p2", "beta"):
        params[(name,)] = jnp.asarray(
            ref.state_dict()[name].numpy().transpose(0, 2, 3, 1))
    x = _x((2, 8, 6, 6))
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    v = Vars(params, {}, ApplyCtx(train=False))
    got = np.asarray(ours(v, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_meta_aconc():
    torch.manual_seed(2)
    c1 = 32  # r=16 -> fc bottleneck max(16, 2)=16
    ref = ra.MetaAconC(c1).eval()
    ours = A.MetaAconC(c1)
    params, _ = ours.init(jax.random.PRNGKey(0))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    for name in ("p1", "p2"):
        params[(name,)] = jnp.asarray(sd[name].transpose(0, 2, 3, 1))
    for fc in ("fc1", "fc2"):
        params[(fc, "kernel")] = jnp.asarray(sd[f"{fc}.weight"].transpose(2, 3, 1, 0))
        params[(fc, "bias")] = jnp.asarray(sd[f"{fc}.bias"])
    x = _x((2, c1, 6, 6))
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()
    v = Vars(params, {}, ApplyCtx(train=False))
    got = np.asarray(ours(v, jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------- loss variants

def _logits_targets(shape=(64,)):
    logits = RNG.uniform(-4, 4, shape).astype(np.float32)
    targets = (RNG.uniform(0, 1, shape) > 0.5).astype(np.float32)
    return logits, targets


def test_smooth_bce():
    assert L.smooth_bce(0.1) == rl.smooth_BCE(0.1)
    assert L.smooth_bce() == rl.smooth_BCE()


@pytest.mark.parametrize("pos_weight", [1.0, 2.5])
def test_bce_with_logits(pos_weight):
    logits, targets = _logits_targets()
    ref = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([pos_weight]), reduction="none")
    want = ref(torch.tensor(logits), torch.tensor(targets)).numpy()
    got = np.asarray(L.bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                       pos_weight))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_focal_loss():
    logits, targets = _logits_targets()
    ref = rl.FocalLoss(torch.nn.BCEWithLogitsLoss(), gamma=1.5, alpha=0.25)
    want = float(ref(torch.tensor(logits), torch.tensor(targets)))
    got = float(np.mean(np.asarray(
        L.focal_bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                gamma=1.5, alpha=0.25))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_qfocal_loss():
    logits, targets = _logits_targets()
    ref = rl.QFocalLoss(torch.nn.BCEWithLogitsLoss(), gamma=1.5, alpha=0.25)
    want = float(ref(torch.tensor(logits), torch.tensor(targets)))
    got = float(np.mean(np.asarray(
        L.qfocal_bce_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                                 gamma=1.5, alpha=0.25))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_blur():
    logits, targets = _logits_targets()
    ref = rl.BCEBlurWithLogitsLoss(alpha=0.05)
    want = float(ref(torch.tensor(logits), torch.tensor(targets)))
    got = float(np.mean(np.asarray(
        L.bce_blur_with_logits(jnp.asarray(logits), jnp.asarray(targets),
                               alpha=0.05))))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_varifocal():
    # ref utils/tal.py:73-85: weight = alpha*sigmoid(pred)^gamma*(1-label)
    # + gt_score*label; sum reduction
    pred = RNG.uniform(-4, 4, (2, 32, 10)).astype(np.float32)
    gt = RNG.uniform(0, 1, (2, 32, 10)).astype(np.float32)
    label = (RNG.uniform(0, 1, (2, 32, 10)) > 0.7).astype(np.float32)
    ref = RefVarifocal()
    want = float(ref(torch.tensor(pred), torch.tensor(gt), torch.tensor(label)))
    got = float(np.asarray(L.varifocal_with_logits(
        jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(label))))
    np.testing.assert_allclose(got, want, rtol=1e-4)
