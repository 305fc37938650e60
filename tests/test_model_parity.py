"""Golden parity: build the torch reference model, import its weights, and
compare raw head outputs + decoded predictions within tolerance.

This is the SURVEY.md §4 test pyramid level (a)/(b): numerics per full
model graph vs the reference, and yaml/jit coverage for the configs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dmayolo_tpu.graph import DetectionModel
from dmayolo_tpu.utils.torch_import import import_torch_state

torch = pytest.importorskip("torch")
from tests.ref_compat import setup_reference_imports  # noqa: E402

if not setup_reference_imports():
    pytest.skip("reference unavailable", allow_module_level=True)

from models.yolo import Model as RefModel  # noqa: E402
from tests.ref_compat import patch_ca_alias  # noqa: E402

patch_ca_alias()

REF = "/root/reference/models"


def build_pair(cfg, img=256):
    torch.manual_seed(0)
    ref = RefModel(f"{REF}/{cfg}")
    ref.eval()
    ours = DetectionModel(f"{REF}/{cfg}")
    params, stats, report = import_torch_state(ours, ref.state_dict())
    assert not report["missing"], report["missing"][:10]
    assert not report["unused"], report["unused"][:10]
    return ref, ours, params, stats


def forward_pair(ref, ours, params, stats, img=256, bs=1):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(bs, 3, img, img)).astype(np.float32)
    with torch.no_grad():
        t_dec, t_raw = ref(torch.tensor(x))
    j_raw = ours.apply(params, stats, jnp.asarray(x.transpose(0, 2, 3, 1)))
    j_dec = np.asarray(ours.decode(j_raw))
    return t_dec.numpy(), [t.numpy() for t in t_raw], j_dec, [np.asarray(t) for t in j_raw]


@pytest.mark.parametrize("cfg", ["yolov5n.yaml", "yolov5s.yaml"])
def test_yolov5_parity(cfg):
    ref, ours, params, stats = build_pair(cfg)
    # param count parity
    n_ref = sum(p.numel() for p in ref.parameters())
    n_ours = sum(int(p.size) for p in params.values())
    assert n_ours == n_ref, (n_ours, n_ref)
    assert np.allclose(ours.stride, ref.stride.numpy())

    t_dec, t_raw, j_dec, j_raw = forward_pair(ref, ours, params, stats)
    for tr, jr in zip(t_raw, j_raw):
        # torch raw is (b, na, ny, nx, no); ours (b, ny, nx, na, no)
        jr = jr.transpose(0, 3, 1, 2, 4)
        np.testing.assert_allclose(jr, tr, atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(j_dec, t_dec, atol=5e-2, rtol=1e-3)


def test_dma_flagship_parity():
    """ablation-ca-scconv-sppfcspc: the DMA VisDrone recipe config
    (train.sh:1) — C3CA + SCConv + SPPFCSPC + AdConcat BiFPN."""
    ref, ours, params, stats = build_pair("ablation-ca-scconv-sppfcspc.yaml")
    n_ref = sum(p.numel() for p in ref.parameters())
    n_ours = sum(int(p.size) for p in params.values())
    assert n_ours == n_ref
    t_dec, t_raw, j_dec, j_raw = forward_pair(ref, ours, params, stats)
    for tr, jr in zip(t_raw, j_raw):
        np.testing.assert_allclose(jr.transpose(0, 3, 1, 2, 4), tr, atol=5e-3, rtol=1e-3)
    np.testing.assert_allclose(j_dec, t_dec, atol=1e-1, rtol=1e-3)


def test_tdetect_parity():
    """CASPD_ODRTA: anchor-free TDetect head config (train.sh:3)."""
    torch.manual_seed(0)
    ref = RefModel(f"{REF}/CASPD_ODRTA.yaml")
    ref.eval()
    ours = DetectionModel(f"{REF}/CASPD_ODRTA.yaml")
    params, stats, report = import_torch_state(ours, ref.state_dict())
    assert not report["missing"], report["missing"][:10]
    np.testing.assert_allclose(ours.stride, ref.stride.numpy())

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        t_out = ref(torch.tensor(x))
    # reference TDetect eval returns (y, (x, box, cls)); y is (b, 4+nc, A)
    t_dec = t_out[0].numpy()
    j_raw = ours.apply(params, stats, jnp.asarray(x.transpose(0, 2, 3, 1)))
    j_dec = np.asarray(ours.decode(j_raw))  # (b, A, 4+nc)
    np.testing.assert_allclose(j_dec.transpose(0, 2, 1), t_dec, atol=5e-2, rtol=1e-3)


@pytest.mark.parametrize("name", ["CASMM", "CMCA", "adaptadd"])
def test_repaired_config_parity(name):
    """Forward parity on the REPAIRED variants of the reference's broken
    published configs (tools/repair_configs.py).  The repairs stay within
    the reference's own parse_model semantics, so the repaired yaml builds
    in BOTH frameworks — letting us run true weight-imported forward parity
    on SMMConv (CASMM), the non-aliased CoorAttention name (CMCA), and
    AdaptADD softmax fusion (adaptadd).  CASMMsiou's BAM head is
    untransformable in the reference (missing from yolo.py:388's width
    list), so it is covered by build-only tests instead."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = f"{repo}/dmayolo_tpu/configs/models/{name}.yaml"
    torch.manual_seed(0)
    ref = RefModel(cfg)
    ref.eval()
    ours = DetectionModel(cfg)
    params, stats, report = import_torch_state(ours, ref.state_dict())
    assert not report["missing"], report["missing"][:10]
    assert not report["unused"], report["unused"][:10]
    n_ref = sum(p.numel() for p in ref.parameters())
    n_ours = sum(int(p.size) for p in params.values())
    assert n_ours == n_ref, (n_ours, n_ref)
    np.testing.assert_allclose(ours.stride, ref.stride.numpy())

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 1, size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        _, t_raw = ref(torch.tensor(x))
    j_raw = ours.apply(params, stats, jnp.asarray(x.transpose(0, 2, 3, 1)))
    # adaptadd chains 4 softmax-fusion stages; float noise accumulates a bit
    # more than the plain-conv configs (measured max |Δ| 0.0068 at 0.16% of
    # elements on logits of magnitude ~5)
    atol = 1e-2 if name == "adaptadd" else 5e-3
    for tr, jr in zip(t_raw, j_raw):
        np.testing.assert_allclose(
            np.asarray(jr).transpose(0, 3, 1, 2, 4), tr.numpy(),
            atol=atol, rtol=1e-3)


@pytest.mark.parametrize(
    "cfg",
    [
        "C3CASPD.yaml",           # P2 4-head + SPD
        "yolov5l-xs-tph.yaml",    # swin transformer prediction heads
        "hornet.yaml",            # gnConv/HorBlock
        "ghostnet.yaml",          # GhostV2
        "yolo_cspcm.yaml",        # ConvMixer
        "DM.yaml",                # DM/SM downsampling family
        "yolov5l-xs-tr-cbam-spp-bifpn.yaml",  # CBAM + C3TR + SPP + BiFPN
        "C3CASPD6.yaml",          # Adapt_Add2 weighted fusion
        "hub/yolov5s-ghost.yaml",  # GhostConv/GhostBottleneck v1 backbone
    ],
)
def test_exotic_config_parity(cfg):
    import os
    if not os.path.exists(f"{REF}/{cfg}"):
        pytest.skip(f"{cfg} not in reference")
    try:
        torch.manual_seed(0)
        ref = RefModel(f"{REF}/{cfg}")
    except Exception as e:
        pytest.skip(f"config broken in reference too: {e}")
    ref.eval()
    ours = DetectionModel(f"{REF}/{cfg}")
    params, stats, report = import_torch_state(ours, ref.state_dict())
    assert not report["missing"], report["missing"][:10]

    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, size=(1, 3, 256, 256)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.tensor(x))
    t_raw = out[1] if isinstance(out, tuple) else out
    j_raw = ours.apply(params, stats, jnp.asarray(x.transpose(0, 2, 3, 1)))
    if isinstance(t_raw, (list, tuple)) and t_raw and hasattr(t_raw[0], "numpy"):
        for tr, jr in zip(t_raw, j_raw):
            tr = tr.numpy()
            jr = np.asarray(jr)
            if jr.ndim == 5:
                jr = jr.transpose(0, 3, 1, 2, 4)
            else:  # TDetect raw NHWC -> NCHW view comparison skipped; decode checked elsewhere
                continue
            # deep attention stacks (tph) accumulate slightly more float noise
            atol = 1e-2 if "tph" in cfg else 5e-3
            np.testing.assert_allclose(jr, tr, atol=atol, rtol=1e-3)
