"""Module-level golden parity for zoo blocks NO reference config reaches.

test_model_parity.py covers every block that appears in a buildable yaml
(full-model forward vs the torch reference). The reference also ships zoo
modules that no config instantiates — ASFF, SPPCSPC, ASPP, CBAM,
MixConv2d, CrossConv, Sum, AdaptADD/AdaptConcat, Adapt_Add2/3,
GhostBottleneck, Classify, Contract/Expand (common.py / experimental.py).
These are API surface a user can wire into a custom yaml, so each gets a
direct block-vs-torch-module golden test here: instantiate the reference
module, import its state_dict into our block, compare forwards
(NCHW<->NHWC transposed) on random inputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.nn import blocks as B
from dmayolo_tpu.nn.module import ApplyCtx, Vars
from dmayolo_tpu.utils.torch_import import import_torch_state

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from models import common as rc  # noqa: E402
from models import experimental as re_  # noqa: E402

# torch CPU convs route through oneDNN (different accumulation order /
# algorithm than XLA); observed module-level deltas are ~3e-4 absolute on
# O(0.1) activations — 1e-3/5e-3 is a tight golden (full-model decode
# parity in test_model_parity.py accepts 5e-2)
ATOL = 1e-3


def run_pair(tmod, jmod, shapes, seed=0, atol=ATOL, list_input=None,
             out_transpose=True):
    """shapes: list of NCHW input shapes. list_input: None = single tensor,
    "list" = forward(list), "args" = forward(*tensors)."""
    tmod.eval()
    params, stats, report = import_torch_state(jmod, tmod.state_dict())
    assert not report["missing"], report["missing"][:8]
    assert not report["unused"], report["unused"][:8]

    rng = np.random.default_rng(seed)
    xs = [rng.uniform(-1, 1, s).astype(np.float32) for s in shapes]
    with torch.no_grad():
        if list_input == "list":
            t_out = tmod([torch.tensor(x) for x in xs])
        elif list_input == "args":
            t_out = tmod(*[torch.tensor(x) for x in xs])
        else:
            t_out = tmod(torch.tensor(xs[0]))
    v = Vars(params, stats, ApplyCtx(train=False))
    js = [jnp.asarray(x.transpose(0, 2, 3, 1)) for x in xs]
    j_out = jmod(v, js if list_input else js[0])
    j_out = np.asarray(j_out)
    t_np = t_out.numpy()
    if out_transpose and j_out.ndim == 4:
        j_out = j_out.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_out, t_np, atol=atol, rtol=5e-3)
    return True


@pytest.mark.parametrize("level", [0, 1, 2])
def test_asff(level):
    # fixed dims [512, 256, 256]; level_0 smallest spatial (ref common.py:1083-1154)
    torch.manual_seed(0)
    run_pair(rc.ASFF(level), B.ASFF(level),
             [(1, 512, 8, 8), (1, 256, 16, 16), (1, 256, 32, 32)],
             list_input="args")


@pytest.mark.parametrize("level", [2, 3])
def test_adapt_add(level):
    torch.manual_seed(1)
    # weight_map consumes dim1-channel inputs; level 3 adds a dim3->dim1
    # compressed third input (ref common.py:913-951)
    shapes = [(1, 32, 16, 16), (1, 32, 16, 16)]
    if level == 3:
        shapes.append((1, 16, 16, 16))
    run_pair(rc.AdaptADD(level, 48, 1, 32, 32, 16),
             B.AdaptADD(level, 48, 1, 32, 32, 16), shapes, list_input="list")


@pytest.mark.parametrize("level", [2, 3])
def test_adapt_concat(level):
    torch.manual_seed(2)
    shapes = [(1, 32, 16, 16), (1, 24, 16, 16)]
    if level == 3:
        shapes.append((1, 16, 16, 16))
    run_pair(rc.AdaptConcat(level, 1, 32, 24, 16),
             B.AdaptConcat(level, 1, 32, 24, 16), shapes, list_input="list")


@pytest.mark.parametrize("n", [2, 3])
def test_adapt_add23(n):
    torch.manual_seed(3)
    if n == 2:
        run_pair(rc.Adapt_Add2(), B.AdaptAdd2(),
                 [(1, 24, 16, 16), (1, 24, 16, 16)], list_input="list")
    else:
        run_pair(rc.Adapt_Add3(16, 16, 24), B.AdaptAdd3(16, 16, 24),
                 [(1, 16, 16, 16), (1, 16, 16, 16), (1, 24, 16, 16)],
                 list_input="list")


def test_sppcspc():
    torch.manual_seed(4)
    run_pair(rc.SPPCSPC(64, 32), B.SPPCSPC(64, 32), [(1, 64, 32, 32)])


def test_aspp():
    torch.manual_seed(5)
    run_pair(rc.ASPP(32, 48), B.ASPP(32, 48), [(1, 32, 16, 16)])


def test_cbam():
    torch.manual_seed(6)
    run_pair(rc.CBAM(32, 32), B.CBAM(32, 32), [(1, 32, 16, 16)])


@pytest.mark.parametrize("equal_ch", [True, False])
def test_mixconv2d(equal_ch):
    torch.manual_seed(7)
    run_pair(re_.MixConv2d(16, 24, k=(1, 3), equal_ch=equal_ch),
             B.MixConv2d(16, 24, k=(1, 3), equal_ch=equal_ch),
             [(1, 16, 16, 16)])


@pytest.mark.parametrize("shortcut", [False, True])
def test_crossconv(shortcut):
    torch.manual_seed(8)
    run_pair(re_.CrossConv(24, 24, 3, 1, 1, 1.0, shortcut),
             B.CrossConv(24, 24, 3, 1, 1, 1.0, shortcut), [(1, 24, 16, 16)])


@pytest.mark.parametrize("weight", [False, True])
def test_sum(weight):
    torch.manual_seed(9)
    run_pair(re_.Sum(3, weight), B.Sum(3, weight),
             [(1, 8, 8, 8)] * 3, list_input="list")


@pytest.mark.parametrize("stride", [1, 2])
def test_ghost_bottleneck(stride):
    torch.manual_seed(10)
    run_pair(rc.GhostBottleneck(32, 32, 3, stride),
             B.GhostBottleneck(32, 32, 3, stride), [(1, 32, 16, 16)])


def test_classify():
    torch.manual_seed(11)
    run_pair(rc.Classify(32, 10), B.Classify(32, 10), [(2, 32, 8, 8)],
             out_transpose=False)


@pytest.mark.parametrize("gain", [2])
def test_contract_expand(gain):
    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, (1, 16, 8, 8)).astype(np.float32)
    with torch.no_grad():
        t_c = rc.Contract(gain)(torch.tensor(x)).numpy()
        t_e = rc.Expand(gain)(torch.tensor(x)).numpy()
    v = Vars({}, {}, ApplyCtx(train=False))
    j = jnp.asarray(x.transpose(0, 2, 3, 1))
    j_c = np.asarray(B.Contract(gain)(v, j)).transpose(0, 3, 1, 2)
    j_e = np.asarray(B.Expand(gain)(v, j)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(j_c, t_c, atol=1e-6)
    np.testing.assert_allclose(j_e, t_e, atol=1e-6)
